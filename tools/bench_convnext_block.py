"""Microbench + correctness: fused ConvNeXt block kernel vs the shipped
dwln-Pallas + XLA-MLP path, chained at per-stage ConvNeXt-L geometries.

Run: python tools/bench_convnext_block.py [--iters 30] [--stages stage2]
     [--check]   (adds a CPU-vs-kernel numerical check on tiny shapes)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from axial_vs_tpu.ops.convnext_pallas import (
    convnext_block_fused, dwconv7x7_layernorm)

STAGES = {
    "stage0": (2, 193, 337, 192, 3),
    "stage1": (2, 97, 169, 384, 3),
    "stage2": (2, 49, 85, 768, 27),
    "stage3": (2, 25, 43, 1536, 3),
}


def make_params(c, rng):
    return dict(
        kernel=jnp.asarray(rng.randn(7, 7, 1, c) * 0.1, jnp.float32),
        cbias=jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        ln_scale=jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.randn(c), jnp.float32),
        w1=jnp.asarray(rng.randn(c, 4 * c) * (c ** -0.5), jnp.float32),
        b1=jnp.asarray(rng.randn(4 * c) * 0.01, jnp.float32),
        w2=jnp.asarray(rng.randn(4 * c, c) * ((4 * c) ** -0.5), jnp.float32),
        b2=jnp.asarray(rng.randn(c) * 0.01, jnp.float32),
        gamma=jnp.asarray(np.full(c, 0.2), jnp.float32),
    )


def baseline_block(x, p):
    y = dwconv7x7_layernorm(x, p["kernel"], p["cbias"], p["ln_scale"],
                            p["ln_bias"])
    h = jnp.dot(y, p["w1"].astype(y.dtype)) + p["b1"].astype(jnp.bfloat16)
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                  * (h + 0.044715 * h * h * h)))
    o = jnp.dot(h, p["w2"].astype(h.dtype)) + p["b2"].astype(jnp.bfloat16)
    return x + o * p["gamma"].astype(x.dtype)


def fused_block(x, p, mlp_first=True):
    return convnext_block_fused(
        x, p["kernel"], p["cbias"], p["ln_scale"], p["ln_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"],
        mlp_first=mlp_first)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stages", nargs="*", default=["stage0", "stage2"])
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    if args.check:
        n, h, w, c = 1, 19, 23, 256
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        p = make_params(c, rng)
        ref = baseline_block(x, p)
        for mf in (True, False):
            got = fused_block(x, p, mlp_first=mf)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f"check mlp_first={mf}: max|diff|={err:.4f} rel={rel:.4f}")
            assert rel < 0.05, "fused block disagrees with baseline"

    for name in args.stages:
        n, h, w, c, blocks = STAGES[name]
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        p = make_params(c, rng)

        def chain(fn, **kw):
            @jax.jit
            def loop(x, niter):
                def body(i, carry):
                    # cast: f32 carry would promote bf16 x (wrong bench)
                    y = x + (carry * 1e-12).astype(x.dtype)
                    for _ in range(blocks):
                        y = fn(y, p, **kw) if kw else fn(y, p)
                    return jnp.mean(y, dtype=jnp.float32)

                return jax.lax.fori_loop(0, niter, body, jnp.float32(0))

            float(loop(x, 1))
            t0 = time.perf_counter()
            float(loop(x, args.iters))
            return (time.perf_counter() - t0) / args.iters / blocks * 1e3

        tb = chain(baseline_block)
        tf = chain(fused_block, mlp_first=True)
        td = chain(fused_block, mlp_first=False)
        print(f"{name} ({n},{h},{w},{c}) x{blocks}: baseline {tb:.3f} "
              f"fused(mlp_first) {tf:.3f} fused(dw_first) {td:.3f} ms/block")


if __name__ == "__main__":
    main()

"""Microbench: fused dwconv7x7+LayerNorm Pallas kernel tile_h sweep.

Per-stage ConvNeXt-L shapes at the 769x1345 bench resolution. The kernel's
grid is (N, ceil(H/tile_h)); tile_h trades per-step fixed cost against
VMEM footprint and halo overlap.

Run: python tools/bench_dwconv.py [--iters 30]
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

from axial_vs_tpu.ops.convnext_pallas import dwconv7x7_layernorm

STAGES = {  # name -> (N, H, W, C) at 769x1345, T=2
    "stage0": (2, 193, 337, 192),
    "stage1": (2, 97, 169, 384),
    "stage2": (2, 49, 85, 768),
    "stage3": (2, 25, 43, 1536),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tiles", type=int, nargs="*",
                    default=[8, 16, 24, 32, 48])
    ap.add_argument("--stages", nargs="*", default=list(STAGES))
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    for name in args.stages:
        n, h, w, c = STAGES[name]
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.randn(7, 7, 1, c) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        ls = jnp.ones((c,), jnp.float32)
        lb = jnp.zeros((c,), jnp.float32)
        for th in args.tiles:
            if th >= 2 * h:
                continue

            chain = 8  # amortize the ~1.4 ms/iter fori_loop meter overhead

            @jax.jit
            def loop(x, k, b, ls, lb, niter, th=th):
                def body(i, carry):
                    # cast the checksum feed-in to x.dtype: a f32 carry
                    # would PROMOTE bf16 x to f32 and bench the wrong kernel
                    y = x + (carry * 1e-12).astype(x.dtype)
                    for _ in range(chain):
                        y = dwconv7x7_layernorm(y, k, b, ls, lb, tile_h=th)
                    return jnp.mean(y, dtype=jnp.float32)

                return jax.lax.fori_loop(0, niter, body, jnp.float32(0))

            float(loop(x, k, b, ls, lb, 1))
            t0 = time.perf_counter()
            float(loop(x, k, b, ls, lb, args.iters))
            dt = (time.perf_counter() - t0) / (args.iters * chain) * 1e3
            flops = 2 * 49 * n * h * w * c
            print(f"{name} ({n},{h},{w},{c}) tile_h={th:3d}: {dt:6.3f} ms "
                  f"({flops/dt*1e-9:.2f} TFLOP/s)")


if __name__ == "__main__":
    main()

"""Experiment: does Mosaic overlap independent VPU and MXU work in one
Pallas kernel?

Three kernels at a stage2-like ConvNeXt-L geometry:
  vpu  — 49-tap shift-FMA over a (TH*W, C) f32 block (dwconv-like)
  mxu  — (TH*W, C) @ (C, 4C) @ (4C, C) (MLP-like)
  both — the two with INDEPENDENT inputs in one kernel body

If t(both) ~= max(t_vpu, t_mxu): the units overlap -> a fused ConvNeXt
block kernel can hide the depthwise conv under the MLP dots.
If t(both) ~= t_vpu + t_mxu: they serialize -> no win.

Run: python tools/bench_overlap.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

TH, W, C = 8, 85, 768  # stage2-ish tile
TOKENS = TH * W


def _vpu_work(x):
    # 49 dependent FMAs (dwconv-like accumulation chain)
    acc = jnp.zeros_like(x)
    for i in range(49):
        acc = acc + x * np.float32(0.01 * (i + 1))
    return acc


def _mxu_work(t, w1, w2):
    h = jnp.dot(t, w1, preferred_element_type=jnp.float32)
    return jnp.dot(h.astype(t.dtype), w2, preferred_element_type=jnp.float32)


def k_vpu(x_ref, o_ref):
    o_ref[:] = _vpu_work(x_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def k_mxu(t_ref, w1_ref, w2_ref, o_ref):
    o_ref[:] = _mxu_work(t_ref[:], w1_ref[:], w2_ref[:]).astype(o_ref.dtype)


def k_both(x_ref, t_ref, w1_ref, w2_ref, ov_ref, om_ref):
    # independent chains — Mosaic may interleave the vector ops with the
    # in-flight matmuls
    ov_ref[:] = _vpu_work(x_ref[:].astype(jnp.float32)).astype(ov_ref.dtype)
    om_ref[:] = _mxu_work(t_ref[:], w1_ref[:], w2_ref[:]).astype(om_ref.dtype)


def k_interleave(x_ref, t_ref, w1_ref, w2_ref, ov_ref, om_ref):
    # explicit chunk interleaving: vector FMAs of chunk j+1 are independent
    # of the dots of chunk j — give the scheduler adjacent independent work
    NC = 4
    rows = TOKENS // NC
    for j in range(NC):
        sl = slice(j * rows, (j + 1) * rows)
        ov_ref[sl, :] = _vpu_work(
            x_ref[sl, :].astype(jnp.float32)).astype(ov_ref.dtype)
        om_ref[sl, :] = _mxu_work(
            t_ref[sl, :], w1_ref[:], w2_ref[:]).astype(om_ref.dtype)


def run(name, fn, outs, *args, iters=50, grid=None):
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = len(args)
    call = pl.pallas_call(
        fn,
        out_shape=outs,
        grid=grid or (27,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: tuple([0] * a.ndim),
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=(tuple(
            pl.BlockSpec(o.shape, lambda i: tuple([0] * len(o.shape)),
                         memory_space=pltpu.VMEM) for o in outs)
            if isinstance(outs, tuple) else
            pl.BlockSpec(outs.shape, lambda i: tuple([0] * len(outs.shape)),
                         memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def loop(n, *a):
        def body(i, carry):
            out = call(a[0] + carry.astype(a[0].dtype) * 0, *a[1:])
            leaves = jax.tree.leaves(out)
            return jnp.mean(leaves[0], dtype=jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(1, *args))
    t0 = time.perf_counter()
    float(loop(iters, *args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.3f} ms (grid of 27 tiles)")
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(TOKENS, C), jnp.bfloat16)     # vpu input
    t = jnp.asarray(rng.randn(TOKENS, C), jnp.bfloat16)     # mxu input
    w1 = jnp.asarray(rng.randn(C, 4 * C) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(4 * C, C) * 0.02, jnp.bfloat16)
    sd = jax.ShapeDtypeStruct

    tv = run("vpu only", k_vpu, sd((TOKENS, C), jnp.bfloat16), x)
    tm = run("mxu only", k_mxu, sd((TOKENS, C), jnp.bfloat16), t, w1, w2)
    tb = run("both    ", k_both,
             (sd((TOKENS, C), jnp.bfloat16), sd((TOKENS, C), jnp.bfloat16)),
             x, t, w1, w2)
    ti = run("interleave", k_interleave,
             (sd((TOKENS, C), jnp.bfloat16), sd((TOKENS, C), jnp.bfloat16)),
             x, t, w1, w2)
    print(f"sum={tv + tm:.3f}  max={max(tv, tm):.3f}  both={tb:.3f}  "
          f"overlap_efficiency={(tv + tm - tb) / min(tv, tm):.2f}")


if __name__ == "__main__":
    main()

"""Probe: streaming HBM bandwidth of a trivial Pallas kernel vs XLA.

Decides whether a Pallas gather-reduce can ever compete with XLA fusions on
this chip: if even `out = 2*x` at 88 MB runs far below XLA's elementwise
bandwidth, multi-input Pallas reduces are off the table.

Run: python tools/bench_pallas_bw.py [--rows 346128] [--block 1024]
"""
from __future__ import annotations

import argparse
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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * jnp.bfloat16(2)


def _sum12_kernel(*refs):
    xs, o_ref = refs[:-1], refs[-1]
    acc = xs[0][...].astype(jnp.float32)
    for x in xs[1:]:
        acc = acc + x[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def pallas_copy(x, block):
    r, c = x.shape
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        grid=(r // block,),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def pallas_sum12(*xs, block):
    r, c = xs[0].shape
    return pl.pallas_call(
        _sum12_kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), xs[0].dtype),
        grid=(r // block,),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * len(xs),
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*xs)


def timeit(name, fn, *args, iters=20, nbytes=0):
    @jax.jit
    def loop(n, *a):
        def body(i, carry):
            # first operand depends on the carry so nothing hoists
            a0 = a[0] + carry.astype(a[0].dtype) * 1e-12
            out = fn(a0, *a[1:])
            return out.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(1, *args))
    t0 = time.perf_counter()
    float(loop(iters, *args))
    dt = (time.perf_counter() - t0) / iters
    gbs = nbytes / dt / 1e9
    print(f"{name}: {dt*1e3:.2f} ms, {gbs:.0f} GB/s effective")


def _gather_kernel(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        t_ref[...], i_ref[...], axis=0, mode="promise_in_bounds")


def vmem_gather(t, idx):
    s, c = t.shape
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, idx)


def probe_gather(iters):
    """tpu.dynamic_gather cost vs table height: constant-rate => VMEM-table
    MSDA gather kernel is viable; linear => it's a select-loop, dead end."""
    rng = np.random.RandomState(0)
    # Mosaic requires index bitwidth == data bitwidth: bf16 -> int16
    # (table height < 32768), f32 -> int32
    for s, vdt, it in ((4096, jnp.float32, np.int32),
                       (1024, jnp.float32, np.int32),
                       (16384, jnp.float32, np.int32),
                       (4096, jnp.bfloat16, np.int16)):
        t = jnp.asarray(rng.randn(s, 128).astype(np.float32), vdt)
        idx = jnp.asarray(
            rng.randint(0, s, (s, 128)).astype(it))
        try:
            out = np.asarray(vmem_gather(t, idx), np.float32)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"dyn_gather S={s} {t.dtype}: FAILED {msg}")
            continue
        want = np.take_along_axis(np.asarray(t, np.float32),
                                  np.asarray(idx), axis=0)
        err = np.max(np.abs(out - want))
        nrows = s * 128  # one gathered element per (row, lane)

        @jax.jit
        def loop(n, t, idx):
            def body(i, carry):
                tt = t + carry.astype(t.dtype) * 1e-12
                return vmem_gather(tt, idx).astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(1, t, idx))
        t0 = time.perf_counter()
        float(loop(iters, t, idx))
        dt = (time.perf_counter() - t0) / iters
        print(f"dyn_gather S={s} {t.dtype}: {dt*1e3:.3f} ms, "
              f"{nrows/dt/1e9:.2f} G elems/s, err={err}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=346112)  # / 1024
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--gather", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.gather:
        probe_gather(args.iters)
        return

    r, c = args.rows, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(r, c).astype(np.float32), jnp.bfloat16)
    xs = [jnp.asarray(rng.randn(r, c).astype(np.float32), jnp.bfloat16)
          for _ in range(12)]
    nb = r * c * 2

    timeit("xla_copy (read+write 88MB)", jax.jit(lambda v: v * 2), x,
           iters=args.iters, nbytes=2 * nb)
    timeit(f"pallas_copy block={args.block}",
           functools.partial(pallas_copy, block=args.block), x,
           iters=args.iters, nbytes=2 * nb)
    timeit("xla_sum12 (read 1.06GB)",
           jax.jit(lambda *v: functools.reduce(jnp.add, v)), *xs,
           iters=args.iters, nbytes=13 * nb)
    timeit(f"pallas_sum12 block={args.block}",
           functools.partial(pallas_sum12, block=args.block), *xs,
           iters=args.iters, nbytes=13 * nb)


if __name__ == "__main__":
    main()

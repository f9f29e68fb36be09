"""Experiment: can a Pallas VMEM-resident-slab gather beat XLA's HBM gather?

RESULT (round 4): NO — structurally blocked. Mosaic rejects
`slab_ref[pl.ds(idx, 1), :]` with a runtime row index ("cannot statically
prove that index in dimension 0 is a multiple of 8"): VMEM rows live
inside (sublane, lane) tiles and dynamic sublane-granular addressing is
not expressible. Emulating it (dynamic-index a (S/16, 16, 128) page
array, one-hot-select the sublane) costs ~10 VPU ops/row vs XLA's
measured ~1.7 cycles/row HBM gather floor — strictly worse. Kept as the
record + harness in case Mosaic grows a vector gather primitive.

The MSDA core (ops/msda.py) is gather-bound in BOTH hot pipelines: the
row-gathers run at XLA's measured ~550M rows/s floor (docs/PERFORMANCE.md),
25 ms/clip of the Tube-Link decoder and 13 ms/clip of the kMaX WC module.
XLA gathers from HBM; but MSDA's sampling is per-(frame, head, level)
local — each (frame, head, level) slab of the packed corner table is
0.9-4.2 MB and FITS IN VMEM. This measures whether Mosaic's dynamic row
indexing (`slab_ref[pl.ds(i, 1), :]`) from a VMEM-resident slab sustains
a higher row rate than the XLA HBM gather, at the real shapes:

  tube_l0: Tube-Link VIS 360x640 level-0, per (frame, head) slab
  kmax_l0: kMaX WC 769x1345 level-0, per (frame, head) slab

Variants: xla (current formulation's per-point gather+FMA), pl_uN
(Pallas, unroll N query rows per loop iteration).

Run: python tools/exp_vmem_gather.py [--iters 20] [--chain 8]
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# (slab_rows S, queries NQ, points P, lanes)  — lanes = 4*D = 128
SHAPES = {
    # Tube-Link: S0=45*80, Lq=4760 (all levels' queries), per (frame, head)
    "tube_l0": (3600, 4760, 4, 128),
    # kMaX WC: S0=97*169, Lq=21633, per (frame, head)
    "kmax_l0": (16393, 21633, 4, 128),
}


def _k_gather(idx_ref, w_ref, slab_ref, out_ref, *, p, unroll):
    blkq = out_ref.shape[0]

    def body(j, _):
        q0 = j * unroll
        for u in range(unroll):
            q = q0 + u
            acc = (slab_ref[pl.ds(idx_ref[q, 0], 1), :]
                   * w_ref[q, 0]).astype(jnp.float32)
            for pp in range(1, p):
                acc = acc + slab_ref[pl.ds(idx_ref[q, pp], 1), :] * w_ref[q, pp]
            out_ref[pl.ds(q, 1), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, blkq // unroll, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("variant", "s", "blkq"))
def run(idx, w, slab, variant: str, s: int, blkq: int = 1024):
    nq, p = idx.shape
    if variant == "xla":
        acc = jnp.zeros((nq, slab.shape[1]), jnp.float32)
        for pp in range(p):
            g = slab.at[idx[:, pp]].get(mode="promise_in_bounds")
            acc = acc + g * w[:, pp:pp + 1]
        return acc.astype(slab.dtype)
    unroll = int(variant.split("_u")[1])
    pad = (-nq) % blkq
    grid = ((nq + pad) // blkq,)
    return pl.pallas_call(
        functools.partial(_k_gather, p=p, unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blkq, p), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((blkq, p), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            # whole slab resident; same block every step -> DMA'd once
            pl.BlockSpec((s, slab.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blkq, slab.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq + pad, slab.shape[1]), slab.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",  # CPU numerics smoke
    )(idx, w, slab)[:nq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    ap.add_argument("--variants", nargs="*",
                    default=["xla", "pl_u1", "pl_u4", "pl_u8"])
    ap.add_argument("--blkq", type=int, default=1024)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    for name in args.shapes:
        s, nq, p, lanes = SHAPES[name]
        slab = jnp.asarray(rng.randn(s, lanes), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, s, (nq, p)), jnp.int32)
        w = jnp.asarray(rng.rand(nq, p), jnp.float32)

        ref = np.asarray(run(idx, w, slab, "xla", s=s).astype(jnp.float32))
        for vname in args.variants:
            got = np.asarray(
                run(idx, w, slab, vname, s=s, blkq=args.blkq)
                .astype(jnp.float32))
            err = np.abs(got - ref).max()
            tag = "OK " if err < 0.1 else f"MISMATCH max={err:.4f} "

            chain = args.chain

            @jax.jit
            def loop(idx, w, slab, niter, vname=vname):
                def body(i, carry):
                    acc = jnp.float32(0)
                    ii = idx + (carry * 0).astype(jnp.int32)
                    for _ in range(chain):
                        y = run(ii, w, slab, vname, s=s, blkq=args.blkq)
                        acc = acc + jnp.mean(y, dtype=jnp.float32)
                        ii = ii + (acc * 0).astype(jnp.int32)
                    return acc

                return jax.lax.fori_loop(0, niter, body, jnp.float32(0))

            float(loop(idx, w, slab, 1))
            t0 = time.perf_counter()
            float(loop(idx, w, slab, args.iters))
            dt = (time.perf_counter() - t0) / (args.iters * chain) * 1e3
            rows = nq * p
            print(f"{name} (S={s}, NQ={nq}, P={p}) {vname:6s}: {tag}"
                  f"{dt:7.3f} ms  ({rows / dt * 1e-6:.0f}M rows/s)",
                  flush=True)


if __name__ == "__main__":
    main()

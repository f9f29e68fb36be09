"""Pallas TPU kernel: MSDA sample-weighted corner reduction (v2).

Consumes the materialized gather output g (R, S, 4*D) and LANE-PACKED slot
weights w (R, S*4) and produces out (R, D):

    out[r, d] = sum_s sum_k g[r, s, k*D+d] * w[r, s*4+k]

v1 passed w as (R, S, 4); the (S, 4) trailing dims tile to (16, 128) so
each 24 KB weight block ballooned to 512 KB of VMEM traffic — more than
the gather block itself. v2 keeps w 2-D (R, S*4): a (block, 48) tile pads
to (block, 128) lanes only. The weight broadcast to D lanes happens
in-register; the kernel is HBM-traffic-bound (reads g once, writes out).

Used by ops/msda.py behind AXIALVS_MSDA_PALLAS=1; the default XLA path
(per-sample gathers fused into the accumulate) avoids materializing g at
all — benchmark both with tools/bench_msda.py before switching.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _multi_kernel(w_ref, *refs, d: int, n: int):
    """refs = (g_0..g_{n-1}, out). Each g (BLK, 4*D); w (BLK, N*4).
    out[r, :] = sum_si sum_k g_si[r, k*D:(k+1)*D] * w[r, si*4+k]."""
    g_refs, out_ref = refs[:n], refs[n]
    blk = out_ref.shape[0]
    # arithmetic 0/1 corner masks (loop-invariant): an i1 where-mask built
    # from a lane iota trips a Mosaic relayout ("non-singleton dim
    # replicated in destination"), multiplies do not
    grp = jax.lax.broadcasted_iota(jnp.int32, (blk, 4 * d), 1) // d
    masks = [(grp == k).astype(g_refs[0].dtype) for k in range(4)]
    w = w_ref[...]
    acc = jnp.zeros((blk, 4 * d), jnp.float32)
    for si in range(n):
        g = g_refs[si][...]
        ws = w[:, si * 4:(si + 1) * 4]
        w128 = (ws[:, 0:1] * masks[0] + ws[:, 1:2] * masks[1]
                + ws[:, 2:3] * masks[2] + ws[:, 3:4] * masks[3])
        acc = acc + (g * w128).astype(jnp.float32)
    out_ref[...] = (
        acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
        + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d]
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def weighted_corner_reduce_multi(gs, w, block_rows: int = 1024):
    """gs: list of N (R, 4*D) gathered corner rows; w: (R, N*4) lane-packed
    slot weights -> (R, D). Reads each g exactly once; the weight expansion
    (4 sublane splats + 3 lane-range selects) happens in VMEM."""
    n = len(gs)
    r, d4 = gs[0].shape
    d = d4 // 4
    assert w.shape == (r, n * 4), (w.shape, r, n)
    pad = (-r) % block_rows
    if pad:
        gs = [jnp.pad(g, ((0, pad), (0, 0))) for g in gs]
        w = jnp.pad(w, ((0, pad), (0, 0)))
    rp = r + pad
    grid = (rp // block_rows,)
    out = pl.pallas_call(
        functools.partial(_multi_kernel, d=d, n=n),
        out_shape=jax.ShapeDtypeStruct((rp, d), gs[0].dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, n * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((block_rows, d4), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in range(n)],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(w, *gs)
    return out[:r]


def _v4_kernel(e_ref, w_ref, *refs, d: int, n: int):
    """Lean reduce: weight expansion on the MXU (one (BLK,4n)@(4n,n*4d)
    dot against a constant 0/1 matrix), then n fused FMAs + corner fold."""
    g_refs, out_ref = refs[:n], refs[n]
    wall = jax.lax.dot_general(
        w_ref[...], e_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK, n*4d)
    acc = jnp.zeros((out_ref.shape[0], 4 * d), jnp.float32)
    for si in range(n):
        acc = acc + g_refs[si][...].astype(jnp.float32) * wall[
            :, si * 4 * d:(si + 1) * 4 * d]
    out_ref[...] = (
        acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
        + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d]
    ).astype(out_ref.dtype)


def _v4_expand_matrix(n: int, d: int, slot_major: bool = False):
    """(n*4, n*4d) 0/1 bf16 mapping weight columns to lane ranges.
    sample-major: column si*4 + k; slot-major: column k*n + si (the layout
    ops/msda.py builds with a fused minor-axis concat). Either way the
    weight for (sample si, slot k) lands on lanes [si*4d + k*d, +d)."""
    e = np.zeros((n * 4, n * 4 * d), np.float32)
    for si in range(n):
        for k in range(4):
            col = (k * n + si) if slot_major else (si * 4 + k)
            lo = si * 4 * d + k * d
            e[col, lo:lo + d] = 1.0
    return jnp.asarray(e, jnp.bfloat16)


import os as _os

_V4_BLOCK = int(_os.environ.get("AXIALVS_MSDA_V4_BLOCK", "512"))


@functools.partial(jax.jit, static_argnames=("block_rows", "slot_major"))
def weighted_corner_reduce_v4(gs, w, block_rows: int = _V4_BLOCK,
                              slot_major: bool = False):
    """gs: list of N (R, 4*D) gathered corner rows; w (R, N*4) lane-packed
    slot weights -> (R, D) f32->gs dtype. Handles non-dividing R via the
    Pallas edge-block padding (no host-side jnp.pad copies)."""
    n = len(gs)
    r, d4 = gs[0].shape
    d = d4 // 4
    e = _v4_expand_matrix(n, d, slot_major=slot_major)
    grid = (pl.cdiv(r, block_rows),)
    return pl.pallas_call(
        functools.partial(_v4_kernel, d=d, n=n),
        out_shape=jax.ShapeDtypeStruct((r, d), gs[0].dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n * 4, n * 4 * d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows, n * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((block_rows, d4), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in range(n)],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(e, w.astype(jnp.bfloat16), *gs)


def _v4_math(gs, w, slot_major: bool):
    """Pure-jnp equivalent of the v4 kernel's math (gathered rows ->
    weighted corner fold). Used as the VJP rule of the differentiable
    wrapper below: its gradient touches only the reduce (elementwise +
    lane-group sums) — the gathers live OUTSIDE and autodiff them to
    scatter-adds exactly as on the XLA path."""
    n = len(gs)
    r, d4 = gs[0].shape
    d = d4 // 4
    acc = jnp.zeros((r, d), jnp.float32)
    for si in range(n):
        for k in range(4):
            col = (k * n + si) if slot_major else (si * 4 + k)
            acc = acc + (
                gs[si][:, k * d:(k + 1) * d].astype(jnp.float32)
                * w[:, col][:, None].astype(jnp.float32))
    return acc.astype(gs[0].dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def weighted_corner_reduce_v4_ad(gs, w, slot_major: bool = False):
    """Differentiable v4 reduce (VERDICT r4 #4): forward = the Pallas v4
    kernel (the inference fast path, ~40% faster than the XLA
    accumulate), backward = the VJP of the identical jnp math
    (``_v4_math``). Residuals are the (already-materialized) gathered
    rows + weights, so the backward adds no extra gathers; the training
    forward no longer has to ride the slow XLA accumulate path
    "by construction". ``gs`` must be a TUPLE (pytree leaf list)."""
    return weighted_corner_reduce_v4(list(gs), w, slot_major=slot_major)


def _v4_ad_fwd(gs, w, slot_major):
    return (weighted_corner_reduce_v4(list(gs), w, slot_major=slot_major),
            (gs, w))


def _v4_ad_bwd(slot_major, res, ct):
    gs, w = res
    _, vjp = jax.vjp(lambda g, ww: _v4_math(g, ww, slot_major), gs, w)
    return vjp(ct)


weighted_corner_reduce_v4_ad.defvjp(_v4_ad_fwd, _v4_ad_bwd)


def _v5_kernel(e_ref, w_ref, *refs, d: int, n: int, p: int):
    """v4 with per-LEVEL merged gathers: each g holds P samples side by
    side in lanes ((R, P*4D), sample pi at lanes [pi*4D, (pi+1)*4D)) so
    the XLA gather count drops from N=L*P to L — the lane split happens
    here on VMEM-resident data instead of as separate kCustom fusions."""
    g_refs, out_ref = refs[:n // p], refs[n // p]
    wall = jax.lax.dot_general(
        w_ref[...], e_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK, n*4d)
    acc = jnp.zeros((out_ref.shape[0], 4 * d), jnp.float32)
    for lvl in range(n // p):
        g = g_refs[lvl][...].astype(jnp.float32)
        for pi in range(p):
            si = lvl * p + pi
            acc = acc + g[:, pi * 4 * d:(pi + 1) * 4 * d] * wall[
                :, si * 4 * d:(si + 1) * 4 * d]
    out_ref[...] = (
        acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
        + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d]
    ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("p", "block_rows", "slot_major"))
def weighted_corner_reduce_v5(gs, w, p: int, block_rows: int = _V4_BLOCK,
                              slot_major: bool = False):
    """gs: list of L (R, P*4D) merged gathered rows (per-level, P samples
    in lanes); w (R, L*P*4) lane-packed slot weights -> (R, D)."""
    nl = len(gs)
    n = nl * p
    r, pd4 = gs[0].shape
    d = pd4 // (4 * p)
    e = _v4_expand_matrix(n, d, slot_major=slot_major)
    grid = (pl.cdiv(r, block_rows),)
    return pl.pallas_call(
        functools.partial(_v5_kernel, d=d, n=n, p=p),
        out_shape=jax.ShapeDtypeStruct((r, d), gs[0].dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n * 4, n * 4 * d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows, n * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((block_rows, pd4), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in range(nl)],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(e, w.astype(jnp.bfloat16), *gs)


def _pack_kernel(a_ref, b_ref, out_ref, *, w: int, md: int, d: int):
    """Corner-table pack for one (batch row, s-tile): out rows s hold the
    2x2 neighborhood [v[s], v[s+1], v[s+w], v[s+w+1]] per head, lane order
    (m, k, d). a/b are tile-aligned windows at block rows i and i+1 so the
    shifted reads below stay static slices."""
    tile = out_ref.shape[1]
    col = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)  # (2*tile, M*D)
    parts = []
    for m in range(md // d):
        for off in (0, 1, w, w + 1):
            parts.append(col[off:off + tile, m * d:(m + 1) * d])
    out_ref[0] = jnp.concatenate(parts, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "n_heads", "block_rows", "interpret"))
def pack_corner_table(v, width: int, n_heads: int = 8,
                      block_rows: int = 512, interpret: bool = False):
    """v (B, S, M*D) bf16 (one level, S = H*W row-major) -> packed corner
    table (B, S, M*4D) with out[b, s, m*4D + k*D + d] = v[b, s + off_k,
    m*D + d], off = (0, 1, W, W+1). Out-of-range lanes hold junk-but-
    finite data, NOT necessarily zeros: interior blocks read the
    zero-padded tail, but the LAST grid block's shifted window is clamped
    (si+1 -> nblk-1), so when pad < offset its reads wrap back into the
    same block's start (duplicated rows, like the jnp.roll build's wrap).
    Both are fine for the consumer, which zero-weights every
    out-of-neighborhood lane (finite junk can never leak a NaN through
    0*x) — but do not rely on zeros (advisor r4).

    NEGATIVE RESULT (round 4, kept as the record): Mosaic refuses to
    lower the (m, k, d) lane interleave from (m, d)-keyed source rows
    ("result/input offset mismatch on non-concat dimension"), and the
    one-hot MXU lane-spread workaround costs as much as the ~236 GB/s
    XLA roll-concat fusion this was meant to replace. ops/msda.py keeps
    the XLA build; this compiles only in interpret mode (contract test
    in tests/test_msda.py)."""
    b, s, md = v.shape
    d = md // n_heads
    assert width + 1 <= block_rows, (width, block_rows)
    nblk = pl.cdiv(s, block_rows)
    pad = nblk * block_rows - s
    if pad:
        # zero-pad to whole blocks: Pallas edge-block reads beyond the
        # array are undefined (possibly non-finite bit patterns)
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    grid = (b, nblk)
    out = pl.pallas_call(
        functools.partial(_pack_kernel, w=width, md=md, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_rows, md), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_rows, md),
                lambda bi, si: (bi, jnp.minimum(si + 1, nblk - 1), 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, 4 * md),
                               lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblk * block_rows, 4 * md),
                                       v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(v, v)
    return out[:, :s]


def pack_corner_table_ref(v, width: int, n_heads: int = 8):
    """jnp oracle: the roll-based build from ops/msda.py, one level."""
    b, s, md = v.shape
    d = md // n_heads
    v4 = v.reshape(b, s, n_heads, d)
    rolled = [jnp.roll(v4, -o, axis=1) for o in (0, 1, width, width + 1)]
    return jnp.concatenate(rolled, axis=-1).reshape(b, s, 4 * md)


def weighted_corner_reduce_ref(g, w):
    """Pure-jnp reference for tests. w (R, S*4)."""
    r, s, d4 = g.shape
    d = d4 // 4
    gg = g.astype(jnp.float32).reshape(r, s, 4, d)
    ww = w.astype(jnp.float32).reshape(r, s, 4)
    return jnp.einsum("rskd,rsk->rd", gg, ww).astype(g.dtype)

"""Microbenchmark for the MSDA core op at VIPSeg scale (one v5e chip).

Times the production path (`ops/msda.py`) against experimental
formulations of the gather+reduce so layout decisions are measured, not
guessed. Shapes match the WC module at 769x1345 / T=2 / 8 heads / D=32.

Run: python tools/bench_msda.py [--iters 20] [--variant NAME ...]
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

from axial_vs_tpu.ops import msda


SHAPES = ((97, 169), (49, 85), (25, 43))
B, M, D, P = 2, 8, 32, 4


def build_inputs(rng):
    s = sum(h * w for h, w in SHAPES)
    lq = s
    value = jnp.asarray(rng.randn(B, s, M, D).astype(np.float32), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, lq, M, len(SHAPES), P, 2).astype(np.float32))
    aw = jax.nn.softmax(
        jnp.asarray(rng.randn(B, lq, M, len(SHAPES) * P).astype(np.float32))
    ).reshape(B, lq, M, len(SHAPES), P)
    return value, loc, aw


def variant_prod(value, loc, aw):
    return msda.ms_deform_attn(value, SHAPES, loc, aw)


def _prep(value, loc, aw):
    """Shared packing/index/weight computation (mirrors ops/msda.py)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    packed_parts = []
    offset = 0
    level_start = []
    for h, w in SHAPES:
        level_start.append(offset)
        v_l = jax.lax.dynamic_slice_in_dim(value, offset, h * w, axis=1)
        offset += h * w
        packed_parts.append(jnp.concatenate(
            [v_l, jnp.roll(v_l, -1, axis=1), jnp.roll(v_l, -w, axis=1),
             jnp.roll(v_l, -(w + 1), axis=1)], axis=-1))
    flat = jnp.concatenate(packed_parts, axis=1).reshape(b * s * m, 4 * d)

    loc_m = loc.transpose(0, 2, 1, 3, 4, 5).astype(jnp.float32)
    aw_m = aw.transpose(0, 2, 1, 3, 4).astype(jnp.float32)
    bm_base = (jnp.arange(b, dtype=jnp.int32)[:, None] * (s * m)
               + jnp.arange(m, dtype=jnp.int32)[None, :])
    idx_parts, wgt_parts = [], []
    for lvl, (h, w) in enumerate(SHAPES):
        l = loc_m[:, :, :, lvl]
        a = aw_m[:, :, :, lvl]
        ix = l[..., 0] * w - 0.5
        iy = l[..., 1] * h - 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0

        def slot_weights(c0, t, size):
            w0 = (1.0 - t) * ((c0 >= 0) & (c0 <= size - 1))
            w1 = t * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
            shifted = c0 == -1
            return jnp.where(shifted, w1, w0), jnp.where(shifted, 0.0, w1)

        wx0, wx1 = slot_weights(x0, tx, w)
        wy0, wy1 = slot_weights(y0, ty, h)
        slot_w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                           axis=-1) * a[..., None]
        wgt_parts.append(slot_w.astype(value.dtype))
        xi = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        idx_parts.append(
            (level_start[lvl] + yi * w + xi) * m + bm_base[:, :, None, None])
    idx = jnp.concatenate(idx_parts, axis=3)
    wgt = jnp.concatenate(wgt_parts, axis=3)
    return flat, idx, wgt


def variant_sample_loop(value, loc, aw):
    """One gather per sample, fused multiply-accumulate — the (rows, S, 4D)
    intermediate never materializes if XLA fuses the 12 gathers into the
    accumulation fusion."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)

    acc = jnp.zeros((rows, 4 * d), jnp.bfloat16)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w128 = jnp.repeat(wgt[:, si], d, axis=-1)
        acc = acc + g * w128
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


def variant_pallas(value, loc, aw):
    os.environ["AXIALVS_MSDA_PALLAS"] = "1"
    try:
        return msda.ms_deform_attn(value, SHAPES, loc, aw)
    finally:
        os.environ["AXIALVS_MSDA_PALLAS"] = "0"


VARIANTS = {
    "prod": variant_prod,
    "sample_loop": variant_sample_loop,
    "pallas": variant_pallas,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variant", action="append", default=None)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(0)
    value, loc, aw = build_inputs(rng)
    names = args.variant or list(VARIANTS)

    ref = None
    for name in names:
        fn = VARIANTS[name]
        out = jax.jit(fn)(value, loc, aw)
        got = np.asarray(out, np.float32)  # materialize: forces execution
        if got.ndim == 4:  # head-major variants
            got = got.transpose(0, 2, 1, 3).reshape(got.shape[0], got.shape[2], -1)
        if ref is None:
            ref = got
        else:
            err = np.max(np.abs(got - ref))
            print(f"{name}: max |diff| vs prod = {err:.4f}")

        # device-side timing loop: the axon backend executes lazily, so a
        # host loop + block_until_ready measures dispatch, not compute
        @jax.jit
        def loop(value, loc, aw, n, fn=fn):
            def body(i, carry):
                out = fn(value + carry.astype(value.dtype) * 1e-12, loc, aw)
                return out.astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(value, loc, aw, 1))
        t0 = time.perf_counter()
        float(loop(value, loc, aw, args.iters))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.2f} ms/layer")




def variant_sample_loop_fold(value, loc, aw):
    """Like sample_loop but folds the 4 corners per sample (32-wide acc)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)

    acc = jnp.zeros((rows, d), jnp.float32)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w128 = jnp.repeat(wgt[:, si], d, axis=-1)
        gw = (g * w128).astype(jnp.float32)
        acc = acc + (gw[:, 0 * d:1 * d] + gw[:, 1 * d:2 * d]
                     + gw[:, 2 * d:3 * d] + gw[:, 3 * d:4 * d])
    out = acc.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


def variant_sample_loop_f32(value, loc, aw):
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)

    acc = jnp.zeros((rows, 4 * d), jnp.float32)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w128 = jnp.repeat(wgt[:, si], d, axis=-1)
        acc = acc + (g * w128).astype(jnp.float32)
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["sample_loop_fold"] = variant_sample_loop_fold
VARIANTS["sample_loop_f32"] = variant_sample_loop_f32




def _chunked(value, loc, aw, chunk):
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)

    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for c0 in range(0, n_samples, chunk):
        g = flat.at[idx[:, c0:c0 + chunk].reshape(-1)].get(
            mode="promise_in_bounds").reshape(rows, chunk, 4 * d)
        w128 = jnp.repeat(wgt[:, c0:c0 + chunk], d, axis=-1)
        acc = acc + jnp.sum(g * w128, axis=1)
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


for _c in (2, 3, 4, 6):
    VARIANTS[f"chunk{_c}"] = (lambda c: lambda v, l, a: _chunked(v, l, a, c))(_c)




def variant_headmajor(value, loc, aw):
    """Head-major packed table: rows ordered (m, b, s) so consecutive
    queries of one head gather ADJACENT table rows (DRAM locality)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    v = value.transpose(2, 0, 1, 3)  # (M, B, S, D)
    packed_parts = []
    offset = 0
    level_start = []
    for h, w in SHAPES:
        level_start.append(offset)
        v_l = jax.lax.dynamic_slice_in_dim(v, offset, h * w, axis=2)
        offset += h * w
        packed_parts.append(jnp.concatenate(
            [v_l, jnp.roll(v_l, -1, axis=2), jnp.roll(v_l, -w, axis=2),
             jnp.roll(v_l, -(w + 1), axis=2)], axis=-1))
    flat = jnp.concatenate(packed_parts, axis=2).reshape(m * b * s, 4 * d)

    loc_m = loc.transpose(0, 2, 1, 3, 4, 5).astype(jnp.float32)
    aw_m = aw.transpose(0, 2, 1, 3, 4).astype(jnp.float32)
    # row id = (m*B + b)*S + s
    mb_base = (
        jnp.arange(m, dtype=jnp.int32)[None, :] * b
        + jnp.arange(b, dtype=jnp.int32)[:, None]
    ) * s  # (B, M)
    idx_parts, wgt_parts = [], []
    for lvl, (h, w) in enumerate(SHAPES):
        l = loc_m[:, :, :, lvl]
        a = aw_m[:, :, :, lvl]
        ix = l[..., 0] * w - 0.5
        iy = l[..., 1] * h - 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0

        def slot_weights(c0, t, size):
            w0 = (1.0 - t) * ((c0 >= 0) & (c0 <= size - 1))
            w1 = t * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
            shifted = c0 == -1
            return jnp.where(shifted, w1, w0), jnp.where(shifted, 0.0, w1)

        wx0, wx1 = slot_weights(x0, tx, w)
        wy0, wy1 = slot_weights(y0, ty, h)
        slot_w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                           axis=-1) * a[..., None]
        wgt_parts.append(slot_w.astype(value.dtype))
        xi = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        idx_parts.append(
            level_start[lvl] + yi * w + xi + mb_base[:, :, None, None])
    idx = jnp.concatenate(idx_parts, axis=3)
    wgt = jnp.concatenate(wgt_parts, axis=3)

    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx_s = idx.reshape(rows, n_samples)
    wgt_s = wgt.reshape(rows, n_samples, 4)
    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for si in range(n_samples):
        g = flat.at[idx_s[:, si]].get(mode="promise_in_bounds")
        w128 = jnp.repeat(wgt_s[:, si], d, axis=-1)
        acc = acc + g * w128
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["headmajor"] = variant_headmajor




def variant_no_final_transpose(value, loc, aw):
    """sample_loop but emitting head-major (b, m, lq, d) — measures the cost
    of the (rows, d) -> (b, lq, m*d) retile in the production path."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)
    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w128 = jnp.repeat(wgt[:, si], d, axis=-1)
        acc = acc + g * w128
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    return out.reshape(b, m, lq, d)


VARIANTS["no_final_transpose"] = variant_no_final_transpose




def variant_gather_only(value, loc, aw):
    """Floor probe: the 12 fused gathers + adds WITHOUT the weight multiply
    (not numerically meaningful — timing only)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for si in range(n_samples):
        acc = acc + flat.at[idx[:, si]].get(mode="promise_in_bounds")
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["gather_only"] = variant_gather_only


def variant_wsplat_fold(value, loc, aw):
    """Round-2 candidate: per-corner (rows, 1) weight SPLATS instead of the
    lane-crossing repeat — a (rows,1)x(rows,D) broadcast-multiply is a free
    sublane splat on TPU, and folding corners per sample keeps the
    accumulator D-wide (lane-rotate reads of the gathered vreg)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)

    acc = jnp.zeros((rows, d), jnp.bfloat16)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w = wgt[:, si]  # (rows, 4)
        acc = acc + (
            g[:, 0 * d:1 * d] * w[:, 0:1]
            + g[:, 1 * d:2 * d] * w[:, 1:2]
            + g[:, 2 * d:3 * d] * w[:, 2:3]
            + g[:, 3 * d:4 * d] * w[:, 3:4]
        )
    out = acc.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


def variant_wselect(value, loc, aw):
    """Round-2 candidate: 128-lane weight vector built from 4 free sublane
    splats + 3 lane-range selects (no repeat shuffle); acc stays 128-wide."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt = wgt.reshape(rows, n_samples, 4)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * d), 1)

    acc = jnp.zeros((rows, 4 * d), jnp.bfloat16)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w = wgt[:, si]
        w128 = jnp.where(
            lane < d, w[:, 0:1],
            jnp.where(lane < 2 * d, w[:, 1:2],
                      jnp.where(lane < 3 * d, w[:, 2:3], w[:, 3:4])))
        acc = acc + g * w128
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["wsplat_fold"] = variant_wsplat_fold
VARIANTS["wselect"] = variant_wselect


def variant_wconst(value, loc, aw):
    """Probe: g * scalar constant (NOT numerically meaningful) — isolates
    whether ANY multiply on the gathered rows breaks the gather+accumulate
    fusion, independent of per-row weight reads."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        acc = acc + g * jnp.bfloat16(0.25)
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["wconst"] = variant_wconst


def variant_wselect_barrier(value, loc, aw):
    """Round-2 candidate: weights materialized ONCE lane-packed (rows, 48)
    behind an optimization_barrier, then expanded per sample with free
    sublane splats + lane-range selects INSIDE the add fusions (the barrier
    stops XLA from duplicating the weight chain into per-sample fusions)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt48 = jax.lax.optimization_barrier(wgt.reshape(rows, n_samples * 4))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * d), 1)

    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for si in range(n_samples):
        g = flat.at[idx[:, si]].get(mode="promise_in_bounds")
        w = wgt48[:, si * 4:(si + 1) * 4]
        w128 = jnp.where(
            lane < d, w[:, 0:1],
            jnp.where(lane < 2 * d, w[:, 1:2],
                      jnp.where(lane < 3 * d, w[:, 2:3], w[:, 3:4])))
        acc = acc + g * w128
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


def variant_pallas_v3(value, loc, aw):
    """Round-2 candidate: XLA does the 12 row gathers (they materialize as
    kCustom fusions regardless), a single Pallas kernel reads each gathered
    array ONCE and applies the 4-slot weights in VMEM (splat + select)."""
    from axial_vs_tpu.ops.msda_pallas import weighted_corner_reduce_multi

    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n_samples = idx.shape[-1]
    idx = idx.reshape(rows, n_samples)
    wgt48 = wgt.reshape(rows, n_samples * 4)
    gs = [flat.at[idx[:, si]].get(mode="promise_in_bounds")
          for si in range(n_samples)]
    out = weighted_corner_reduce_multi(gs, wgt48)  # (rows, d)
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["wselect_barrier"] = variant_wselect_barrier
VARIANTS["pallas_v3"] = variant_pallas_v3


def variant_giant_gather_only(value, loc, aw):
    """Probe: ONE gather of all rows*12 samples (materializes 1.06GB once),
    then an unweighted slice-sum (timing floor for gather-then-reduce)."""
    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n = idx.shape[-1]
    g = flat.at[idx.reshape(-1)].get(mode="promise_in_bounds")
    g = g.reshape(rows, n * 4 * d)
    acc = jnp.zeros((rows, 4 * d), value.dtype)
    for si in range(n):
        acc = acc + g[:, si * 4 * d:(si + 1) * 4 * d]
    out = (acc[:, 0 * d:1 * d] + acc[:, 1 * d:2 * d]
           + acc[:, 2 * d:3 * d] + acc[:, 3 * d:4 * d])
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


def variant_pallas_v4(value, loc, aw):
    """Round-2 candidate: 12 XLA gathers (materialize regardless) + ONE lean
    Pallas reduce whose 4-slot weight expansion rides the MXU."""
    from axial_vs_tpu.ops.msda_pallas import weighted_corner_reduce_v4

    b, s, m, d = value.shape
    lq = loc.shape[1]
    flat, idx, wgt = _prep(value, loc, aw)
    rows = b * m * lq
    n = idx.shape[-1]
    idx = idx.reshape(rows, n)
    gs = [flat.at[idx[:, si]].get(mode="promise_in_bounds")
          for si in range(n)]
    out = weighted_corner_reduce_v4(gs, wgt.reshape(rows, n * 4))
    out = out.reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


VARIANTS["giant_gather_only"] = variant_giant_gather_only
VARIANTS["pallas_v4"] = variant_pallas_v4


def _dump_hlo(names):
    """--dump-hlo: print fusion count + large-buffer stats per variant."""
    import re as _re

    rng = np.random.RandomState(0)
    value, loc, aw = build_inputs(rng)
    for name in names:
        fn = VARIANTS[name]
        txt = jax.jit(fn).lower(value, loc, aw).compile().as_text()
        fusions = _re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = [^\n]*fusion\(",
                              txt, _re.M)
        gathers = txt.count(" gather(")
        kinds = {}
        for line in txt.splitlines():
            mm = _re.search(r"kind=(\w+)", line)
            if "fusion(" in line and mm:
                kinds[mm.group(1)] = kinds.get(mm.group(1), 0) + 1
        print(f"== {name}: {len(fusions)} fusions {kinds}, "
              f"{gathers} gather mentions")
        with open(f"/tmp/hlo_{name}.txt", "w") as f:
            f.write(txt)
        print(f"   full HLO -> /tmp/hlo_{name}.txt")


if __name__ == "__main__":
    if "--dump-hlo" in sys.argv:
        names = [a for a in sys.argv[1:] if not a.startswith("-")]
        _dump_hlo(names or ["prod", "gather_only"])
    else:
        main()

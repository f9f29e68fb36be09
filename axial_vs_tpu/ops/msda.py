"""Multi-scale deformable attention core op — TPU-tuned XLA formulation.

TPU-native replacement for the reference's CUDA extension
(`.../ops/src/cuda/ms_deform_im2col_cuda.cuh`, semantics defined by the
pure-pytorch oracle `.../ops/functions/ms_deform_attn_func.py:52-72`):
per-query bilinear sampling at P points per level per head, weighted-summed
by softmaxed attention weights. Semantics match ``F.grid_sample(
mode='bilinear', padding_mode='zeros', align_corners=False)`` exactly.

TPU gather performance is ROW-COUNT bound (measured on v5e: 16.6M x 32-wide
bf16 rows = 34 ms, 4.15M x 128-wide = 6.6 ms for the same bytes), so instead
of gathering 4 bilinear corners separately we build a PACKED CORNER TABLE:
for every pixel r the table row holds [v[r], v[r+1], v[r+W], v[r+W+1]]
(4*D wide) so one gather per sampling point fetches the whole 2x2
neighborhood. Border points remap their corner weights onto the clipped
top-left slot (the roll-wrapped garbage lanes always carry zero weight).
Everything runs head-major and all-bf16; the final sample reduction is an
elementwise multiply+reduce (a batched dot makes XLA upcast to f32).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    head_major_out: bool = False,
    pallas_reduce: bool = False,
) -> jnp.ndarray:
    """Args:
      value: (B, S, M, D) — levels flattened along S (sum of H*W, row-major).
      spatial_shapes: static ((H_0, W_0), ...) per level.
      sampling_locations: (B, Lq, M, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Lq, M, L, P), already softmaxed over L*P.
    Returns: (B, Lq, M * D), or (B, M, Lq, D) when ``head_major_out`` — the
    head-major form skips a minor-dim-32 retile (~1.9 ms/layer at VIPSeg
    scale); callers can fold the head transpose into their output projection
    (einsum over (m, d) — see layers/msda_attention.py).
    """
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    assert num_levels == len(spatial_shapes)
    assert s == sum(h * w for h, w in spatial_shapes)

    import os

    use_pallas = (
        pallas_reduce
        and jax.default_backend() == "tpu"
        and (4 * d) % 128 == 0
        and os.environ.get("AXIALVS_MSDA_NO_PALLAS") != "1"
    )

    # ---- packed 2x2 corner tables, ONE PER LEVEL: (B*S_l*M, 4*D) ----------
    # row order (b, s, m) matches the value layout, so the pack is pure
    # compact reads/writes — NO head transpose (a transposed pack costs
    # ~10 ms/layer at VIPSeg scale because XLA fuses it into an 88MB
    # strided copy). Negative result (round 4): a Pallas pack kernel
    # (ops/msda_pallas.pack_corner_table) can't beat this XLA fusion —
    # the (m, k, d) lane interleave from (m, d)-keyed source rows is a
    # relayout Mosaic refuses to lower ("result/input offset mismatch on
    # non-concat dimension"), and spreading lanes via a one-hot MXU dot
    # costs as much as the measured ~236 GB/s XLA roll-concat it would
    # replace.
    tables = []
    offset = 0
    for h, w in spatial_shapes:
        v_l = jax.lax.dynamic_slice_in_dim(value, offset, h * w, axis=1)
        offset += h * w
        flat_l = jnp.concatenate(
            [
                v_l,
                jnp.roll(v_l, -1, axis=1),        # (y0, x0+1)
                jnp.roll(v_l, -w, axis=1),        # (y0+1, x0)
                jnp.roll(v_l, -(w + 1), axis=1),  # (y0+1, x0+1)
            ],
            axis=-1,
        )
        tables.append(flat_l.reshape(b * h * w * m, 4 * d))

    # head-major up front: large intermediates already in gather/reduce order
    loc_m = sampling_locations.transpose(0, 2, 1, 3, 4, 5).astype(jnp.float32)
    aw_m = attention_weights.transpose(0, 2, 1, 3, 4).astype(jnp.float32)

    idx_parts = []   # per level: (B, M, Lq, P) packed-row indices (per-table)
    wgt_parts = []   # per level: (B, M, Lq, P, 4) per-slot weights
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = loc_m[:, :, :, lvl]
        aw = aw_m[:, :, :, lvl]  # (B, M, Lq, P)
        ix = loc[..., 0] * w - 0.5
        iy = loc[..., 1] * h - 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0

        def slot_weights(c0, t, size):
            """True corner weights mapped onto the clipped 2-slot window."""
            w0 = (1.0 - t) * ((c0 >= 0) & (c0 <= size - 1))
            w1 = t * ((c0 + 1 >= 0) & (c0 + 1 <= size - 1))
            shifted = c0 == -1  # valid corner is c0+1; it lands in slot 0
            s0 = jnp.where(shifted, w1, w0)
            s1 = jnp.where(shifted, 0.0, w1)
            return s0, s1

        wx0, wx1 = slot_weights(x0, tx, w)
        wy0, wy1 = slot_weights(y0, ty, h)
        # slot order matches the packed concat: (dy, dx) = 00, 01, 10, 11
        wgt_parts.append([
            (s * aw).astype(value.dtype)
            for s in (wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1)
        ])

        xi = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        # per-level row id into tables[lvl]: (b*S_l + s)*M + m
        bm_base = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * (h * w * m)
            + jnp.arange(m, dtype=jnp.int32)[None, :]
        )
        idx_parts.append(
            (yi * w + xi) * m + bm_base[:, :, None, None]
        )
    # SLOT-MAJOR lane-packed weights (B, M, Lq, 4*L*P), column k*LP + si:
    # a concat along the MINOR axis fuses into the elementwise producers,
    # where the old stack(..., -1).reshape retiled a 4-lane layout into 48
    # lanes (~0.3 ms/layer of pure copy)
    wgt48 = jnp.concatenate(
        [wgt_parts[lvl][k] for k in range(4) for lvl in range(num_levels)],
        axis=3,
    )

    n_samples = num_levels * p
    rows = b * m * lq

    if use_pallas:
        # fast path (v4, tools/bench_msda.py: 10.8 vs 14.4 ms/layer at
        # VIPSeg scale): the 12 row gathers materialize as kCustom
        # fusions either way; ONE Pallas kernel then reads each gathered
        # array exactly once and applies the 4-slot weights via an MXU
        # expansion — the XLA path instead spends ~2 extra passes on
        # per-sample weight-broadcast fusions. Differentiable since
        # round 5 (weighted_corner_reduce_v4_ad): backward is the VJP of
        # the identical jnp reduce over the SAME gathered-row residuals
        # (the gathers themselves sit outside and autodiff to
        # scatter-adds exactly as on the XLA path), so training rides
        # the fast forward too (VERDICT r4 #4).
        # Negative result (round 4): merging the P gathers per level into
        # ONE gather of (rows*P,) and reshaping to (rows, P*4D) for a v5
        # reduce measured 23.8 vs 28.3 fps end-to-end — the
        # sublane->lane reshape does NOT fuse into the gather and
        # materializes a second 1 GB copy of the gathered rows
        # (weighted_corner_reduce_v5 kept for the record).
        from .msda_pallas import weighted_corner_reduce_v4_ad

        gs = tuple(
            tables[si // p]
            .at[idx_parts[si // p].reshape(rows, p)[:, si % p]]
            .get(mode="promise_in_bounds")
            for si in range(n_samples)
        )
        out = weighted_corner_reduce_v4_ad(
            gs, wgt48.reshape(rows, 4 * n_samples), True)
        out = out.reshape(b, m, lq, d)
        if head_major_out:
            return out.astype(value.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, lq, m * d).astype(
            value.dtype)
    else:
        # ONE gather per sampling point, fused multiply-accumulate: XLA
        # fuses each 88MB row-gather into the accumulation so the
        # (rows, S, 4D) intermediate (~1 GB at VIPSeg scale) never reaches
        # HBM. Measured v5e: 14.5 ms/layer vs 24 ms for gather-then-reduce
        # (see tools/bench_msda.py; chunked middle grounds are slower).
        wgt_s = wgt48.reshape(rows, 4 * n_samples)
        acc = jnp.zeros((rows, 4 * d), value.dtype)
        for si in range(n_samples):
            idx_si = idx_parts[si // p].reshape(rows, p)[:, si % p]
            g = tables[si // p].at[idx_si].get(mode="promise_in_bounds")
            # slot-major columns: sample si's 4 slot weights at si::ns
            w128 = jnp.repeat(wgt_s[:, si::n_samples], d, axis=-1)
            acc = acc + g * w128
        out = (
            acc[:, 0 * d : 1 * d]
            + acc[:, 1 * d : 2 * d]
            + acc[:, 2 * d : 3 * d]
            + acc[:, 3 * d : 4 * d]
        )

    out = out.reshape(b, m, lq, d)
    if head_major_out:
        return out.astype(value.dtype)
    out = out.transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)

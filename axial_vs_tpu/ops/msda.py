"""Multi-scale deformable attention core op — XLA formulation.

TPU-native replacement for the reference's CUDA extension
(`.../ops/src/cuda/ms_deform_im2col_cuda.cuh`, semantics defined by the
pure-pytorch oracle `.../ops/functions/ms_deform_attn_func.py:52-72`):
per-query bilinear sampling at P points per level per head, weighted-summed
by softmaxed attention weights.

Semantics matched exactly to ``F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)`` on grids ``2*loc - 1``:
pixel coordinate ``ix = loc_x * W - 0.5``; out-of-range corners contribute
zero (via zeroed weights on clipped indices).

Performance note (measured on v5e): XLA TPU gathers are shape-sensitive.
A 4-D ``take_along_axis`` with per-head index arrays lowers ~160 ms/layer at
VIPSeg scale; ONE flat row-gather over a 2-D ``(B*M*S, D)`` operand with
``promise_in_bounds`` indices is ~14x faster. All levels and all 4 bilinear
corners are folded into a single gather per call.
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
) -> jnp.ndarray:
    """Args:
      value: (B, S, M, D) — levels flattened along S (sum of H*W).
      spatial_shapes: static ((H_0, W_0), ...) per level.
      sampling_locations: (B, Lq, M, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Lq, M, L, P), already softmaxed over L*P.
    Returns: (B, Lq, M * D).
    """
    b, s, m, d = value.shape
    _, lq, _, num_levels, p, _ = sampling_locations.shape
    assert num_levels == len(spatial_shapes)
    assert s == sum(h * w for h, w in spatial_shapes)

    # flat row table: (B*M*S, D); row id = ((b*M + m)*S + s)
    flat = value.transpose(0, 2, 1, 3).reshape(b * m * s, d)

    level_start = np.concatenate(
        [[0], np.cumsum([h * w for h, w in spatial_shapes])[:-1]]
    )

    # go head-major ONCE up front so every large intermediate (indices,
    # weights, gathered rows) is already in gather/dot order — no 16M-element
    # transposes downstream
    loc_m = sampling_locations.transpose(0, 2, 1, 3, 4, 5).astype(jnp.float32)
    aw_m = attention_weights.transpose(0, 2, 1, 3, 4).astype(jnp.float32)

    idx_parts = []   # per level: (B, M, Lq, 4, P) flat row indices
    wgt_parts = []   # per level: (B, M, Lq, 4, P) corner x attention weights
    bm_base = (jnp.arange(b * m, dtype=jnp.int32) * s).reshape(b, m)
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = loc_m[:, :, :, lvl]
        aw = aw_m[:, :, :, lvl]  # (B, M, Lq, P)
        ix = loc[..., 0] * w - 0.5
        iy = loc[..., 1] * h - 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0

        corner_idx, corner_wgt = [], []
        for dy in (0, 1):
            for dx in (0, 1):
                xc = x0 + dx
                yc = y0 + dy
                wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
                valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
                xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
                yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
                corner_idx.append(
                    int(level_start[lvl])
                    + yi * w + xi
                    + bm_base[:, :, None, None]
                )
                corner_wgt.append(
                    (jnp.where(valid, wgt, 0.0) * aw).astype(value.dtype)
                )
        idx_parts.append(jnp.stack(corner_idx, axis=3))
        wgt_parts.append(jnp.stack(corner_wgt, axis=3))

    idx = jnp.stack(idx_parts, axis=3)  # (B, M, Lq, L, 4, P)
    wgt = jnp.stack(wgt_parts, axis=3)  # (B, M, Lq, L, 4, P), value dtype

    g = flat.at[idx.reshape(-1)].get(
        mode="promise_in_bounds"
    ).reshape(b, m, lq, num_levels * 4 * p, d)

    # weighted sum over the 48 samples as an all-bf16 multiply+reduce: a
    # batched dot_general here makes XLA upcast the 16M gathered rows to f32
    # (2 x 20 ms/clip of pure converts at VIPSeg scale)
    out = jnp.sum(g * wgt.reshape(b, m, lq, num_levels * 4 * p)[..., None], axis=3)
    out = out.transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)

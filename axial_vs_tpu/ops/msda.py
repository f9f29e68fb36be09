"""Multi-scale deformable attention core op — XLA formulation.

TPU-native replacement for the reference's CUDA extension
(`.../ops/src/cuda/ms_deform_im2col_cuda.cuh`, semantics defined by the
pure-pytorch oracle `.../ops/functions/ms_deform_attn_func.py:52-72`):
per-query bilinear sampling at P points per level per head, weighted-summed
by softmaxed attention weights.

Semantics matched exactly to ``F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)`` on grids ``2*loc - 1``:
pixel coordinate ``ix = loc_x * W - 0.5``; out-of-range corners contribute
zero. One fused gather per level (4 corners packed into the query axis) —
XLA lowers this to a vectorized dynamic-gather; a Pallas kernel can replace
it later without changing this contract.
"""
from __future__ import annotations

from typing import Sequence, Tuple

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

    out = jnp.zeros((b, lq, m, d), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)  # (B, HW, M, D)
        start += h * w
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # (B, Lq, M, P, 2)
        ix = loc[..., 0] * w - 0.5
        iy = loc[..., 1] * h - 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0

        corner_idx = []
        corner_wgt = []
        for dy in (0, 1):
            for dx in (0, 1):
                xc = x0 + dx
                yc = y0 + dy
                wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
                valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
                xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
                yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
                corner_idx.append(yi * w + xi)
                corner_wgt.append(jnp.where(valid, wgt, 0.0))
        idx = jnp.stack(corner_idx, axis=3)  # (B, Lq, M, 4, P)
        wgt = jnp.stack(corner_wgt, axis=3)  # (B, Lq, M, 4, P)

        # one gather per level: fold (Lq, 4, P) into the take axis
        idx_flat = idx.transpose(0, 1, 3, 4, 2).reshape(b, lq * 4 * p, m)
        g = jnp.take_along_axis(v, idx_flat[..., None], axis=1)  # (B, Lq*4*P, M, D)
        g = g.reshape(b, lq, 4, p, m, d).astype(jnp.float32)
        wgt_t = wgt.transpose(0, 1, 3, 4, 2)  # (B, Lq, 4, P, M)
        aw = attention_weights[:, :, :, lvl].astype(jnp.float32)  # (B, Lq, M, P)
        combined = wgt_t * aw.transpose(0, 1, 3, 2)[:, :, None]  # (B, Lq, 4, P, M)
        out = out + jnp.einsum("blkpm,blkpmd->blmd", combined, g)

    return out.reshape(b, lq, m * d).astype(value.dtype)

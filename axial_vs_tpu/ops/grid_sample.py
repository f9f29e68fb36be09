"""Bilinear grid sampling with torch ``F.grid_sample`` semantics (NHWC).

Used by the ViTAEv2-VSA backbone, whose varied-size window attention samples
keys/values at predicted per-window grids via ``F.grid_sample(...,
padding_mode='zeros', align_corners=True)``
(`MaXTron_Tube-Link/mmdet/models/backbones/vitaev2_vsa_modules/window.py:264-265`).

TPU formulation: one flat row gather per bilinear corner over the (H*W)
spatial axis with clipped indices (`promise_in_bounds`), zero-padding handled
by per-corner validity masks folded into the interpolation weights — no
dynamic shapes, fuses cleanly under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(img, grid, align_corners: bool = True):
    """Args:
      img: (B, H, W, C).
      grid: (B, Hg, Wg, 2) normalized (x, y) in [-1, 1].
    Returns: (B, Hg, Wg, C), zeros outside the image.
    """
    b, h, w, c = img.shape
    _, hg, wg, _ = grid.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = (gx + 1.0) * 0.5 * w - 0.5
        iy = (gy + 1.0) * 0.5 * h - 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0

    flat = img.reshape(b, h * w, c)
    out = jnp.zeros((b, hg, wg, c), jnp.float32)
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xc = x0 + dx
            yc = y0 + dy
            valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
            wgt = (wx * wy * valid).astype(jnp.float32)
            xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
            yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
            idx = (yi * w + xi).reshape(b, hg * wg, 1)
            g = jnp.take_along_axis(
                flat, idx, axis=1, mode="promise_in_bounds"
            ).reshape(b, hg, wg, c)
            out = out + g.astype(jnp.float32) * wgt[..., None]
    return out.astype(img.dtype)

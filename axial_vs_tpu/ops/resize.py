"""Bilinear/trilinear resize with exact torch ``F.interpolate`` semantics.

The reference resizes with ``F.interpolate(mode='bilinear', align_corners=
(size % 2 == 1))`` throughout (e.g. `kmax_pixel_decoder.py:271-279`,
`kmax_model.py:279-307`). ``jax.image.resize`` does not match torch when
downscaling (it anti-aliases) nor for align_corners=True, so we build the
interpolation as two (or three) axis-wise weighted gathers with *static*
index/weight arrays computed at trace time — XLA fuses these into cheap
VPU-bound gathers, no dynamic indexing involved.

Torch coordinate rules (upsample_bilinear2d):
- align_corners=False: ``src = max(0, (dst + 0.5) * (in/out) - 0.5)``
- align_corners=True:  ``src = dst * (in - 1) / (out - 1)``
then ``lo = floor(src)``, ``hi = lo + (lo < in-1)``, ``w_hi = src - lo``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int, align_corners: bool):
    if in_size == out_size:
        return None
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def _interp_axis(x, axis: int, in_size: int, out_size: int, align_corners: bool):
    aw = _axis_weights(in_size, out_size, align_corners)
    if aw is None:
        return x
    lo, hi, w_hi = aw
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w_hi, dtype=x.dtype).reshape(shape)
    return x_lo * (1 - w) + x_hi * w


def resize_bilinear(x, size, align_corners: bool = False, h_axis: int = -3, w_axis: int = -2):
    """Resize spatial axes of a channels-last array ``(..., H, W, C)``.

    Args:
      x: array with H at ``h_axis`` and W at ``w_axis``.
      size: (out_h, out_w).
      align_corners: torch semantics flag.
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = int(size[0]), int(size[1])
    x = _interp_axis(x, h_axis, x.shape[h_axis], out_h, align_corners)
    x = _interp_axis(x, w_axis, x.shape[w_axis], out_w, align_corners)
    return x


def resize_trilinear(x, size, align_corners: bool = False, axes=(-4, -3, -2)):
    """Resize three trailing axes (T, H, W) of a channels-last array."""
    assert len(size) == 3
    for axis, out in zip(axes, size):
        axis = axis % x.ndim
        x = _interp_axis(x, axis, x.shape[axis], int(out), align_corners)
    return x


def resize_bilinear_np(x: np.ndarray, size, align_corners: bool = False) -> np.ndarray:
    """Host (numpy) version of ``resize_bilinear`` for data preprocessing —
    same torch-exact coordinate rules, (..., H, W, C) layout."""
    out_h, out_w = int(size[0]), int(size[1])
    for axis, out in ((x.ndim - 3, out_h), (x.ndim - 2, out_w)):
        aw = _axis_weights(x.shape[axis], out, align_corners)
        if aw is None:
            continue
        lo, hi, w_hi = aw
        x_lo = np.take(x, lo, axis=axis)
        x_hi = np.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out
        w = w_hi.reshape(shape).astype(x.dtype)
        x = x_lo * (1 - w) + x_hi * w
    return x

"""Sine position embeddings (2-D and per-frame 3-D), channels-last.

Numerically matches the reference DETR-style embeddings
(`maxtron_deeplab/modeling/within_clip_tracking_module/pos_embeddings.py:12-130`):
cumsum-of-ones coordinates normalized to 2*pi, interleaved sin/cos per axis,
channel order [y, x] (2-D) and [y, x] + z (3-D, z spread over 2*num_pos_feats
channels and added to the concatenated y/x embedding). No parameters; shapes
are static so these fold into constants under jit.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def _sincos(coords, num_feats: int, temperature: float):
    # coords: (...,) -> (..., num_feats) interleaved sin/cos
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos = coords[..., None] / dim_t
    sin = np.sin(pos[..., 0::2])
    cos = np.cos(pos[..., 1::2])
    return np.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], -1)


def position_embedding_sine_2d(height: int, width: int, num_pos_feats: int = 128,
                               temperature: float = 10000.0) -> np.ndarray:
    """(H, W, 2*num_pos_feats) float32 numpy (static)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, height + 1, dtype=np.float32) / (height + eps) * scale)
    x = (np.arange(1, width + 1, dtype=np.float32) / (width + eps) * scale)
    yy = np.broadcast_to(y[:, None], (height, width))
    xx = np.broadcast_to(x[None, :], (height, width))
    pos_y = _sincos(yy, num_pos_feats, temperature)
    pos_x = _sincos(xx, num_pos_feats, temperature)
    return np.concatenate([pos_y, pos_x], axis=-1)


def position_embedding_sine_3d(num_frames: int, height: int, width: int,
                               num_pos_feats: int = 128,
                               temperature: float = 10000.0) -> np.ndarray:
    """(T, H, W, 2*num_pos_feats) float32 numpy: [y,x] embedding + z embedding."""
    scale = 2 * math.pi
    eps = 1e-6
    pos_2d = position_embedding_sine_2d(height, width, num_pos_feats, temperature)
    z = np.arange(1, num_frames + 1, dtype=np.float32) / (num_frames + eps) * scale
    pos_z = _sincos(z, num_pos_feats * 2, temperature)  # (T, 2*npf)
    return pos_2d[None] + pos_z[:, None, None, :]

"""Sine position embeddings (2-D and per-frame 3-D), channels-last.

Numerically matches the reference DETR-style embeddings
(`maxtron_deeplab/modeling/within_clip_tracking_module/pos_embeddings.py:12-130`):
cumsum-of-ones coordinates normalized to 2*pi, interleaved sin/cos per axis,
channel order [y, x] (2-D) and [y, x] + z (3-D, z spread over 2*num_pos_feats
channels and added to the concatenated y/x embedding). No parameters.

Implemented with jnp ops (iota + sin/cos) rather than baked numpy constants:
a 769x1345-scale embedding is tens of MB as an HLO literal — enough to blow
up compile payloads — but a handful of fused VPU ops when computed on device.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _dim_t(num_feats: int, temperature: float) -> np.ndarray:
    dim = np.arange(num_feats, dtype=np.float32)
    return (temperature ** (2 * (dim // 2) / num_feats)).astype(np.float32)


def _sincos(coords, num_feats: int, temperature: float):
    """coords (...,) jnp -> (..., num_feats) interleaved sin/cos."""
    pos = coords[..., None] / jnp.asarray(_dim_t(num_feats, temperature))
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], -1)


def position_embedding_sine_2d(height: int, width: int, num_pos_feats: int = 128,
                               temperature: float = 10000.0):
    """(H, W, 2*num_pos_feats) float32, computed on device.

    The embedding is separable: sin/cos run on the 1-D y/x coordinate
    vectors (H+W elements instead of 2*H*W*num_pos_feats — the 2-D form
    profiled 0.27 ms/clip of pure device sin/cos at VIPSeg scale) and the
    (H, W) broadcast happens in the consumer's fusion. Float-identical:
    same elementwise ops, just not replicated before evaluation."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(1, height + 1, dtype=jnp.float32) / (height + eps) * scale)
    x = (jnp.arange(1, width + 1, dtype=jnp.float32) / (width + eps) * scale)
    pos_y = _sincos(y, num_pos_feats, temperature)  # (H, F)
    pos_x = _sincos(x, num_pos_feats, temperature)  # (W, F)
    return jnp.concatenate(
        [
            jnp.broadcast_to(pos_y[:, None, :], (height, width, num_pos_feats)),
            jnp.broadcast_to(pos_x[None, :, :], (height, width, num_pos_feats)),
        ],
        axis=-1,
    )


def position_embedding_sine_3d(num_frames: int, height: int, width: int,
                               num_pos_feats: int = 128,
                               temperature: float = 10000.0):
    """(T, H, W, 2*num_pos_feats) float32: [y,x] embedding + z embedding."""
    scale = 2 * math.pi
    eps = 1e-6
    pos_2d = position_embedding_sine_2d(height, width, num_pos_feats, temperature)
    z = jnp.arange(1, num_frames + 1, dtype=jnp.float32) / (num_frames + eps) * scale
    pos_z = _sincos(z, num_pos_feats * 2, temperature)  # (T, 2*npf)
    return pos_2d[None] + pos_z[:, None, None, :]

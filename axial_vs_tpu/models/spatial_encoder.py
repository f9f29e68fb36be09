"""Legacy kMaX spatial encoder (V27) — gamma-gated MSDA feature enhancer.

Rebuilds `kmax_deeplab/modeling/spatial_encoder/{kmax_spatial_encoder.py:
16-90, msdeformattn.py:36-380}`: a Deformable-DETR encoder variant that,
unlike the within-clip module (models/wc_module.py), (a) interleaves one
temporal-layer CLONE after EVERY MSDA layer with an optional single
``gamma``-gated residual (`msdeformattn.py:176-177,210-215`), (b) projects
each level back to its ORIGINAL channel count (1x1 conv + GroupNorm,
`msdeformattn.py:283-289`), and (c) residually merges the result into the
backbone features through per-level zero-init channel gammas
(`kmax_spatial_encoder.py:52-60,84-90`).

No shipped reference config enables it (the SPATIAL_ENC cfg keys are never
defined) — it exists for checkpoint compatibility; kept here for inventory
parity and tested against the reference torch module.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers.msda_attention import MSDeformAttnEncoderLayer
from ..layers.position_embeddings import (
    position_embedding_sine_2d,
    position_embedding_sine_3d,
)
from ..layers.trajectory_attention import TemporalEncoder
from ..ops.norm import GroupNorm


class _Proj(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (1, 1),
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="conv",
        )(x)
        return GroupNorm(features=self.features, num_groups=32, name="norm")(y)


class KMaXSpatialEncoder(nn.Module):
    conv_dims: int = 256
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 6
    temporal_layers: int = 0
    temporal_attn_type: str = "trajectory"
    in_features: Sequence[str] = ("res3", "res4", "res5")
    temporal_in_features: Sequence[str] = ("res4", "res5")
    skip_connect_spatial: bool = True
    skip_connect_temporal: bool = False
    zero_init_value: float = 1e-6
    enc_n_points: int = 4
    dropout: float = 0.0
    num_frames: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, features: dict, train: bool = False):
        levels = sorted(self.in_features, reverse=True)  # res5 -> res3
        num_levels = len(levels)
        num_temporal_levels = len(self.temporal_in_features)
        t = self.num_frames
        c = self.conv_dims

        srcs, shapes, orig_chans = [], [], []
        for i, name in enumerate(levels):
            x = features[name]
            srcs.append(_Proj(c, dtype=self.dtype, name=f"input_proj{i}")(x))
            shapes.append((x.shape[1], x.shape[2]))
            orig_chans.append(x.shape[-1])
        bt = srcs[0].shape[0]

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (num_levels, c),
            jnp.float32)
        pos_parts = []
        for i, (h, w) in enumerate(shapes):
            p2 = position_embedding_sine_2d(h, w, num_pos_feats=c // 2)
            pos_parts.append(jnp.asarray(p2.reshape(-1, c)) + level_embed[i])
        pos_flat = jnp.concatenate(pos_parts, axis=0)

        pos_3d = []
        if self.temporal_layers > 0:
            level_embed_3d = self.param(
                "level_embed_3d", nn.initializers.normal(1.0),
                (num_temporal_levels, c), jnp.float32)
            for i in range(num_temporal_levels):
                h, w = shapes[i]
                p3 = jnp.asarray(
                    position_embedding_sine_3d(t, h, w, num_pos_feats=c // 2))
                pos_3d.append(p3 + level_embed_3d[i])

        if self.skip_connect_temporal:
            gamma_t = self.param(
                "gamma_temporal",
                nn.initializers.constant(self.zero_init_value), (c,),
                jnp.float32)

        src_flat = jnp.concatenate([s.reshape(bt, -1, c) for s in srcs], axis=1)
        sizes = [h * w for h, w in shapes]
        temporal_per_layer = (
            self.temporal_layers // self.enc_layers if self.temporal_layers else 0)

        for li in range(self.enc_layers):
            src_flat = MSDeformAttnEncoderLayer(
                d_model=c, d_ffn=self.dim_feedforward, n_levels=num_levels,
                n_heads=self.nheads, n_points=self.enc_n_points,
                dropout=self.dropout, dtype=self.dtype,
                name=f"spatial_layer{li}",
            )(src_flat, pos_flat, tuple(shapes), train=train)
            if self.temporal_layers > 0:
                encoder = TemporalEncoder(
                    d_model=c, d_ffn=self.dim_feedforward,
                    num_heads=self.nheads, num_layers=temporal_per_layer,
                    temporal_attn_type=self.temporal_attn_type,
                    dtype=self.dtype, name=f"temporal_encoder{li}",
                )
                parts, offset = [], 0
                for i, size in enumerate(sizes):
                    piece = src_flat[:, offset:offset + size]
                    offset += size
                    if i < num_temporal_levels:
                        upd, _, _ = encoder(
                            piece, pos_3d[i], num_frames=t,
                            height=shapes[i][0], width=shapes[i][1],
                            train=train)
                        piece = (piece + gamma_t * upd
                                 if self.skip_connect_temporal else upd)
                    parts.append(piece)
                src_flat = jnp.concatenate(parts, axis=1)

        out = dict(features)
        offset = 0
        for i, (name, (h, w)) in enumerate(zip(levels, shapes)):
            piece = src_flat[:, offset:offset + h * w].reshape(bt, h, w, c)
            offset += h * w
            y = _Proj(orig_chans[i], dtype=self.dtype,
                      name=f"output_proj{i}")(piece)
            if self.skip_connect_spatial:
                gamma = self.param(
                    f"gamma{i}", nn.initializers.constant(self.zero_init_value),
                    (orig_chans[i],), jnp.float32)
                out[name] = features[name] + y * gamma
            else:
                out[name] = y
        return out

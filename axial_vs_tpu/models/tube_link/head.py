"""Mask2Former tube head: masked-attention transformer decoder over tubes.

Re-designs `MaXTron_Tube-Link/models/video/tube_link_vis/
mask2former_video_head.py` (`Mask2FormerVideoHeadTube`): 9 decoder layers of
[masked cross-attention over one of 3 pyramid levels (cyclic) x all T
frames' tokens, query self-attention, FFN], post-LN; per-layer video heads
``einsum('bqc,bthwc->btqhw'-style)`` with the attention mask derived from
the previous mask prediction (bilinear to the level size, sigmoid < 0.5,
stop-gradient; all-masked rows reset, ref :462-483, 550-551).
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.position_embeddings import position_embedding_sine_2d
from ...layers.trajectory_attention import _dense
from ...ops.norm import LayerNorm
from ...ops.resize import resize_bilinear
from .pixel_decoder import TubeLinkPixelDecoder


class MaskedMultiheadAttention(nn.Module):
    """Standard MHA with an additive boolean mask (True = blocked)."""

    embed_dims: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None):
        c, h = self.embed_dims, self.num_heads
        d = c // h
        b, lq, _ = query.shape
        lk = key.shape[1]
        q = _dense(c, c, "q_proj", self.dtype)(query).reshape(b, lq, h, d)
        k = _dense(c, c, "k_proj", self.dtype)(key).reshape(b, lk, h, d)
        v = _dense(c, c, "v_proj", self.dtype)(value).reshape(b, lk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
        if attn_mask is not None:
            # attn_mask: (B, h, Lq, Lk) bool, True = block
            logits = jnp.where(attn_mask, -1e9, logits.astype(jnp.float32))
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, lq, c)
        return _dense(c, c, "out_proj", self.dtype)(out)


class Mask2FormerVideoHeadTube(nn.Module):
    num_things_classes: int = 40
    num_stuff_classes: int = 0
    num_queries: int = 100
    feat_channels: int = 256
    out_channels: int = 256
    num_decoder_layers: int = 9
    num_feat_levels: int = 3
    num_heads: int = 8
    ffn_dim: int = 2048
    num_frames: int = 2
    use_temporal_attn: bool = True
    dtype: Any = None

    def _head(self, query, mask_features, target_hw, head_mods):
        """query (B, Q, C); mask_features (B, T, H, W, C).
        Returns cls (B, Q, K+1), masks (B, T, Q, h, w), attn_mask."""
        post_norm, cls_embed, mask_mlp = head_mods
        x = post_norm(query)
        cls_pred = cls_embed(x)
        y = x
        for i, mod in enumerate(mask_mlp):
            y = mod(y)
            if i < len(mask_mlp) - 1:
                y = nn.relu(y)
        mask_embed = y
        mask_pred = jnp.einsum("bqc,bthwc->btqhw", mask_embed, mask_features)

        b, t, q = mask_pred.shape[:3]
        am = resize_bilinear(
            jnp.moveaxis(mask_pred, 2, -1), target_hw, align_corners=False
        )  # (B, T, h, w, Q)
        am = jnp.moveaxis(am, -1, 2).reshape(b, t, q, -1)  # (B, T, Q, hw)
        am = am.transpose(0, 2, 1, 3).reshape(b, q, -1)  # (B, Q, T*hw)
        attn_mask = jax.lax.stop_gradient(jax.nn.sigmoid(am) < 0.5)
        # all-masked rows -> unmasked (ref :550-551)
        all_masked = jnp.all(attn_mask, axis=-1, keepdims=True)
        attn_mask = jnp.where(all_masked, False, attn_mask)
        attn_mask = jnp.broadcast_to(
            attn_mask[:, None], (b, self.num_heads, q, attn_mask.shape[-1])
        )
        return cls_pred, mask_pred, attn_mask

    @nn.compact
    def __call__(self, features: dict, train: bool = False, return_query: bool = False):
        t = self.num_frames
        c = self.feat_channels
        mask_features, multi_scale = TubeLinkPixelDecoder(
            feat_channels=c, out_channels=self.out_channels,
            num_frames=t, use_temporal=self.use_temporal_attn,
            dtype=self.dtype, name="pixel_decoder",
        )(features, train=train)
        bt = mask_features.shape[0]
        b = bt // t
        mask_features = mask_features.reshape(b, t, *mask_features.shape[1:])

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feat_levels, c), jnp.float32,
        )
        decoder_inputs = []
        decoder_pos = []
        level_hw = []
        for i in range(self.num_feat_levels):
            feat = multi_scale[i]
            h, w = feat.shape[1:3]
            level_hw.append((h, w))
            tokens = feat.reshape(b, t * h * w, c) + level_embed[i]
            pos = jnp.asarray(
                position_embedding_sine_2d(h, w, num_pos_feats=c // 2)
            ).reshape(1, h * w, c)
            pos = jnp.tile(pos, (1, t, 1))
            decoder_inputs.append(tokens)
            decoder_pos.append(pos)

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, c),
            jnp.float32,
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, c),
            jnp.float32,
        )
        query = jnp.broadcast_to(
            query_feat[None], (b, self.num_queries, c)
        ).astype(self.dtype or jnp.float32)
        qpos = jnp.broadcast_to(query_embed[None], (b, self.num_queries, c))

        # heads are shared across decoder layers: instantiate ONCE
        head_mods = (
            LayerNorm(features=c, epsilon=1e-5, name="post_norm"),
            _dense(self.num_things_classes + self.num_stuff_classes + 1, c,
                   "cls_embed", self.dtype),
            [
                _dense(c, c, "mask_embed1", self.dtype),
                _dense(c, c, "mask_embed2", self.dtype),
                _dense(self.out_channels, c, "mask_embed3", self.dtype),
            ],
        )

        cls_list, mask_list = [], []
        cls_pred, mask_pred, attn_mask = self._head(
            query, mask_features, level_hw[0], head_mods
        )
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)

        for i in range(self.num_decoder_layers):
            lv = i % self.num_feat_levels
            # masked cross-attention
            attn_out = MaskedMultiheadAttention(
                embed_dims=c, num_heads=self.num_heads, dtype=self.dtype,
                name=f"layer{i}_cross_attn",
            )(
                query + qpos.astype(query.dtype),
                decoder_inputs[lv] + decoder_pos[lv].astype(query.dtype),
                decoder_inputs[lv],
                attn_mask=attn_mask,
            )
            query = LayerNorm(features=c, epsilon=1e-5, name=f"layer{i}_norm1")(
                query + attn_out
            )
            # self-attention
            attn_out = MaskedMultiheadAttention(
                embed_dims=c, num_heads=self.num_heads, dtype=self.dtype,
                name=f"layer{i}_self_attn",
            )(
                query + qpos.astype(query.dtype),
                query + qpos.astype(query.dtype),
                query,
            )
            query = LayerNorm(features=c, epsilon=1e-5, name=f"layer{i}_norm2")(
                query + attn_out
            )
            # FFN
            y = _dense(self.ffn_dim, c, f"layer{i}_ffn1", self.dtype)(query)
            y = nn.relu(y)
            y = _dense(c, self.ffn_dim, f"layer{i}_ffn2", self.dtype)(y)
            query = LayerNorm(features=c, epsilon=1e-5, name=f"layer{i}_norm3")(
                query + y
            )

            cls_pred, mask_pred, attn_mask = self._head(
                query, mask_features,
                level_hw[(i + 1) % self.num_feat_levels], head_mods,
            )
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)

        out = {"cls_preds": cls_list, "mask_preds": mask_list}
        if return_query:
            out["query"] = query
            out["mask_features"] = mask_features
        return out

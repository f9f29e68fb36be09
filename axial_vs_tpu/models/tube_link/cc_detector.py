"""TubeLinkVideoVIS: offline (cross-clip) VIS detector.

Re-designs `MaXTron_Tube-Link/models/video/tube_link_vis/
{mask2former_vis_video.py:48-238, mask2former_video_cc_head.py}`
(`Mask2FormerVideoCCHeadTube` + `TubeLinkVideoVIS`): the frozen WC tube
detector runs clip-by-clip (backbone + pixel/transformer decoder frozen,
last clip padded by frame repetition, ref vis_video :100-155); per-clip
decoder queries pass through ``num_cc_layers`` of [trajectory attention
over (clips x queries) tokens + 1-D ASPP (k 3/3/3, rates 1/2/3) + LN]; a
trainable ``activation_proj`` pools queries across clips for one video-level
class logit, and per-clip mask embeddings produce each clip's masks
(cc_head :761-797).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.trajectory_attention import TrajectoryAttention, _dense
from ...ops.norm import LayerNorm
from ..cc_module import TemporalASPP1D
from .head import Mask2FormerVideoHeadTube


class TubeLinkCCLayers(nn.Module):
    """Cross-clip refinement over per-clip queries (T_clips, Q, C)."""

    num_cc_layers: int = 4
    kernel_sizes: Sequence[int] = (3, 3, 3)
    atrous_rates: Sequence[int] = (1, 2, 3)
    attn_drop: float = 0.0
    aspp_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, clip_queries, train: bool = False):
        t, q, c = clip_queries.shape
        outs = []
        x = clip_queries
        for i in range(self.num_cc_layers):
            tokens = x.reshape(1, t * q, c)
            attn = TrajectoryAttention(
                dim=c, num_heads=8, fused_qkv=True, dtype=self.dtype,
                name=f"trajectory_attn{i}",
            )(tokens, num_frames=t)
            tokens = tokens + nn.Dropout(self.attn_drop)(
                attn, deterministic=not train
            )
            tokens = LayerNorm(features=c, epsilon=1e-5, name=f"attn_norm{i}")(tokens)
            per_query = tokens.reshape(t, q, c).transpose(1, 0, 2)  # (Q, T, C)
            aspp = TemporalASPP1D(
                output_channels=c, kernel_sizes=tuple(self.kernel_sizes),
                atrous_rates=tuple(self.atrous_rates),
                dropout_rate=self.aspp_drop, norm_fn="ln", dtype=self.dtype,
                name=f"aspp{i}",
            )(per_query, train=train)
            per_query = LayerNorm(features=c, epsilon=1e-5, name=f"conv_norm{i}")(
                per_query + aspp
            )
            x = per_query.transpose(1, 0, 2)
            outs.append(x)
        return outs  # per-layer refined queries


class TubeLinkVideoVIS(nn.Module):
    """Frozen WC tube detector + trainable CC refinement and heads."""

    backbone: nn.Module
    num_things_classes: int = 40
    num_queries: int = 100
    num_frames: int = 2  # frames per clip
    num_cc_layers: int = 4
    feat_channels: int = 256
    use_temporal_attn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images (T_clips * V, H, W, 3) -> video-level predictions."""
        v = self.num_frames
        total = images.shape[0]
        assert total % v == 0
        num_clips = total // v
        c = self.feat_channels

        head = Mask2FormerVideoHeadTube(
            num_things_classes=self.num_things_classes,
            num_queries=self.num_queries, feat_channels=c,
            num_frames=v, use_temporal_attn=self.use_temporal_attn,
            dtype=self.dtype, name="wc_head_wrapper",
        )

        clip_queries, clip_mask_feats = [], []
        for ci in range(num_clips):
            clip = images[ci * v : (ci + 1) * v]
            feats = self.backbone(clip, train=False)
            out = head(feats, train=False, return_query=True)
            out = jax.lax.stop_gradient(out)  # frozen segmenter (ref :63-64, 411-422)
            clip_queries.append(out["query"][0])  # (Q, C)
            # recover mask features by re-deriving from the last mask pred is
            # lossy; expose them directly instead:
            clip_mask_feats.append(out["mask_features"][0])  # (V, H, W, C)

        queries = jnp.stack(clip_queries)  # (T_clips, Q, C)
        mask_feats = jnp.stack(clip_mask_feats)  # (T_clips, V, H, W, C)

        refined = TubeLinkCCLayers(
            num_cc_layers=self.num_cc_layers, dtype=self.dtype, name="cc_layers"
        )(queries, train=train)

        # trainable heads shared across CC layers: instantiate once
        activation_proj = _dense(1, c, "activation_proj", self.dtype)
        cls_embed = _dense(self.num_things_classes + 1, c, "cls_embed", self.dtype)
        mask_mlp = [
            _dense(c, c, "mask_embed1", self.dtype),
            _dense(c, c, "mask_embed2", self.dtype),
            _dense(c, c, "mask_embed3", self.dtype),
        ]

        cls_list, mask_list = [], []
        for layer_q in refined:
            # video-level class: activation-weighted pooling over clips
            act = activation_proj(layer_q)  # (T, Q, 1)
            w = jax.nn.softmax(act.astype(jnp.float32), axis=0)
            pooled = jnp.sum(layer_q.astype(jnp.float32) * w, axis=0)  # (Q, C)
            cls_pred = cls_embed(pooled.astype(layer_q.dtype))[None]  # (1, Q, K+1)

            y = layer_q
            for i, mod in enumerate(mask_mlp):
                y = mod(y)
                if i < 2:
                    y = nn.relu(y)
            # per-clip kernels applied to that clip's mask features
            masks = jnp.einsum("tqc,tvhwc->tvqhw", y, mask_feats)
            t, vv, q, h, w_ = masks.shape
            mask_list.append(masks.reshape(1, t * vv, q, h, w_))
            cls_list.append(cls_pred)

        return {"cls_preds": cls_list, "mask_preds": mask_list}

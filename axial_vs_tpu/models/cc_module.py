"""Cross-clip tracking module: trajectory attention + temporal ASPP over
object queries (offline whole-video reasoning).

Re-designs `maxtron_deeplab/modeling/cross_clip_tracking_module/
maxtron_cross_clip_tracking_module.py:30-331`: operates on Hungarian-aligned
per-clip cluster centers (B, Q, T_clips, C). Per layer: trajectory attention
across clips on (t q) tokens -> 1-D ASPP (k=3, rates 1/2/3, replicate
padding) along the clip axis -> LayerNorm -> video-level predictor
(class-activation-weighted query pooling across clips for a single
video-level class logit; per-clip mask kernels against stitched pixel
features).

Query-level video attention decouples video length from pixel count
(SURVEY.md §5 mechanism #3): tokens are T_clips x Q only.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.convbn import ConvBN
from ..layers.kmax_layers import add_bias_towards_void
from ..layers.trajectory_attention import TrajectoryAttention, _dense
from ..ops.norm import BatchNorm, LayerNorm


class TemporalASPP1D(nn.Module):
    """Three dilated 1-D convs over the clip axis, replicate padding
    (ref :176-201). Input (B, T, C) -> (B, T, C)."""

    output_channels: int = 256
    kernel_sizes: Sequence[int] = (3, 3, 3)
    atrous_rates: Sequence[int] = (1, 2, 3)
    dropout_rate: float = 0.0
    norm_fn: str = "ln"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        results = []
        for i, (k, r) in enumerate(zip(self.kernel_sizes, self.atrous_rates)):
            pad = (k - 1) * r // 2
            xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
            y = nn.Conv(
                self.output_channels, (k,), kernel_dilation=(r,), padding="VALID",
                kernel_init=nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
                dtype=self.dtype, name=f"aspp_conv{i}",
            )(xp)
            results.append(y)
        y = jnp.concatenate(results, axis=-1)
        y = ConvBN(
            self.output_channels, kernel_size=1, use_bias=False,
            norm=self.norm_fn if self.norm_fn != "none" else None, act="gelu",
            conv_type="1d", dtype=self.dtype, name="proj_conv",
        )(y, train=train)
        return nn.Dropout(self.dropout_rate)(y, deterministic=not train)


class MaXTronCCPredictor(nn.Module):
    """Video-level class + per-clip mask prediction (ref :30-75).

    class/mask embeddings: (T_clips, N, 256) — batch axis = clips;
    pixel_feature: (T_clips, V*H, W, C) stitched per-clip panoptic features.
    """

    num_classes: int  # includes void
    num_clip_frames: int
    dtype: Any = None

    @nn.compact
    def __call__(self, mask_embeddings, class_embeddings, pixel_feature,
                 train: bool = False):
        t = class_embeddings.shape[0]
        activation = ConvBN(
            1, kernel_size=1, use_bias=True, norm=None, act=None, conv_type="1d",
            conv_init_std=0.01, dtype=self.dtype, name="transformer_class_activation_head",
        )(class_embeddings, train=train)  # (T, N, 1)
        weights = jax.nn.softmax(activation.astype(jnp.float32), axis=0)
        pooled = jnp.sum(
            class_embeddings.astype(jnp.float32) * weights, axis=0, keepdims=True
        ).astype(class_embeddings.dtype)  # (1, N, C)
        class_logits = ConvBN(
            self.num_classes, kernel_size=1, use_bias=True, norm=None, act=None,
            conv_type="1d", conv_init_std=0.01, dtype=self.dtype,
            name="transformer_class_head",
        )(pooled, train=train)
        class_logits = add_bias_towards_void(class_logits)

        mask_kernel = ConvBN(
            128, kernel_size=1, use_bias=False, norm="syncbn", act=None,
            conv_type="1d", dtype=self.dtype, name="transformer_mask_head",
        )(mask_embeddings, train=train)  # (T, N, 128)

        mask_logits = jnp.einsum("thwc,tnc->thwn", pixel_feature, mask_kernel)
        mask_logits = BatchNorm(
            features=1, scale_init=nn.initializers.constant(0.1), dtype=self.dtype,
            name="pixel_space_mask_batch_norm",
        )(mask_logits[..., None], train=train)[..., 0]
        # (T, V*H, W, N) -> (T*V, H, W, N)
        v = self.num_clip_frames
        th, w, n = mask_logits.shape[1:]
        mask_logits = mask_logits.reshape(t * v, th // v, w, n)
        return {"class_logits": class_logits, "mask_logits": mask_logits}


class CrossClipTrackingModule(nn.Module):
    num_classes: int  # without void
    num_layers: int = 6
    num_clip_frames: int = 2
    kernel_sizes: Sequence[int] = (3, 3, 3)
    atrous_rates: Sequence[int] = (1, 2, 3)
    attn_drop: float = 0.0
    aspp_drop: float = 0.0
    norm_fn: str = "ln"
    dtype: Any = None

    @nn.compact
    def __call__(self, clip_query, panoptic_features, train: bool = False):
        """clip_query: (B, Q, T_clips, C) Hungarian-aligned cluster centers;
        panoptic_features: (B*T_clips, V*H, W, C) per-clip stitched pixel
        features (V = frames per clip). Returns dict with video-level
        pred_logits, per-frame pred_masks and aux outputs per layer."""
        b, q, t, c = clip_query.shape
        assert b == 1, "offline CC inference/training runs one video at a time"

        # projections + predictor are SHARED across layers (ref :266-272):
        # single instances, called once per layer
        class_proj = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            conv_type="1d", dtype=self.dtype, name="class_embedding_projection",
        )
        mask_proj = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            conv_type="1d", dtype=self.dtype, name="mask_embedding_projection",
        )
        predictor = MaXTronCCPredictor(
            num_classes=self.num_classes + 1,
            num_clip_frames=self.num_clip_frames,
            dtype=self.dtype, name="predictor",
        )

        predictions_class = []
        predictions_mask = []
        x = clip_query
        for i in range(self.num_layers):
            # trajectory attention over (t q) tokens, frames = clips
            tokens = x.transpose(0, 2, 1, 3).reshape(b, t * q, c)
            attn = TrajectoryAttention(
                dim=c, num_heads=8, fused_qkv=True, dtype=self.dtype,
                name=f"trajectory_attn{i}",
            )(tokens, num_frames=t)
            tokens = tokens + nn.Dropout(self.attn_drop)(
                attn, deterministic=not train
            )
            tokens = LayerNorm(features=c, epsilon=1e-5, name=f"attn_norm{i}")(tokens)

            # short temporal conv along the clip axis per query
            per_query = tokens.reshape(b, t, q, c).transpose(0, 2, 1, 3).reshape(
                b * q, t, c
            )
            aspp = TemporalASPP1D(
                output_channels=c, kernel_sizes=tuple(self.kernel_sizes),
                atrous_rates=tuple(self.atrous_rates), dropout_rate=self.aspp_drop,
                norm_fn=self.norm_fn, dtype=self.dtype, name=f"aspp{i}",
            )(per_query, train=train)
            per_query = LayerNorm(features=c, epsilon=1e-5, name=f"conv_norm{i}")(
                per_query + aspp
            )
            x = per_query.reshape(b, q, t, c)

            # per-clip embeddings -> predictor
            video_query = x.transpose(0, 2, 1, 3).reshape(b * t, q, c)  # (T, Q, C)
            class_emb = class_proj(video_query, train=train)
            mask_emb = mask_proj(video_query, train=train)
            pred = predictor(mask_emb, class_emb, panoptic_features, train=train)
            predictions_class.append(pred["class_logits"])
            predictions_mask.append(pred["mask_logits"])

        return {
            "pred_logits": predictions_class[-1],
            "pred_masks": predictions_mask[-1],
            "aux_outputs": [
                {"pred_logits": cl, "pred_masks": m}
                for cl, m in zip(predictions_class[:-1], predictions_mask[:-1])
            ],
        }

"""kMaX-DeepLab transformer building blocks, TPU-native.

Re-designs `kmax_deeplab/modeling/transformer_decoder/kmax_transformer_decoder.py`
(`AttentionOperation` :43-63, `kMaXPredictor` :67-104, `kMaXTransformerLayer`
:108-214, `ASPP` :217-256, `SemanticPredictor` :259-313) in channels-last JAX.

Conventions: pixel features are (B, H, W, C); object queries are (B, N, C).
The k-means assignment (argmax over mask slots + one-hot scatter under
no_grad, ref :183-194) becomes a stop_gradient'ed one-hot einsum — a dense
(B, N, HW) x (B, HW, D) matmul the MXU runs natively. Softmaxes over
similarity logits run in fp32 as the reference pins them (ref :55-56).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.act import gelu

from ..ops.init import trunc_normal
from ..ops.norm import BatchNorm
from ..ops.resize import resize_bilinear
from .convbn import ConvBN, DropPath


def add_bias_towards_void(class_logits, void_prior_prob: float = 0.9):
    """Shift the last (void) class logit by log-prior (ref :34-39)."""
    num_classes = class_logits.shape[-1]
    bias = jnp.zeros((num_classes,), class_logits.dtype).at[-1].set(
        math.log((num_classes - 1) * void_prior_prob / (1 - void_prior_prob))
    )
    return class_logits + bias


class AttentionOperation(nn.Module):
    """Attention with BN'd similarity logits and BN+gelu on retrieved values.

    query/key: (B, L, h, dk); value: (B, M, h, dv). Returns (B, L, h*dv).
    """

    channels_v: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, query, key, value, train: bool = False):
        b, l, h, _ = query.shape
        sim = jnp.einsum("blhd,bmhd->blmh", query, key)
        sim = BatchNorm(features=h, dtype=self.dtype, name="batch_norm_similarity")(
            sim, train=train
        )
        weights = nn.softmax(sim.astype(jnp.float32), axis=2).astype(value.dtype)
        retrieved = jnp.einsum("blmh,bmhd->blhd", weights, value).reshape(
            b, l, self.channels_v
        )
        retrieved = BatchNorm(
            features=self.channels_v, dtype=self.dtype, name="batch_norm_retrieved_value"
        )(retrieved, train=train)
        return gelu(retrieved)


class KMaXPredictor(nn.Module):
    """Mask/class prediction head (ref :67-104).

    pixel_feature: (B, ..., H, W, C_pixel) — extra leading spatial dims (e.g.
    T folded into H) are fine since convs are shape-polymorphic.
    mask/class embeddings: (B, N, 256).
    Returns class_logits (B, N, num_classes), mask_logits (B, ..., H, W, N),
    pixel_feature (B, ..., H, W, 128) L2-normalized.
    """

    num_classes: int  # includes void
    dtype: Any = None

    @nn.compact
    def __call__(self, mask_embeddings, class_embeddings, pixel_feature, train: bool = False):
        in_ch = pixel_feature.shape[-1]
        x = ConvBN(
            in_ch, kernel_size=5, padding=2, groups=in_ch, use_bias=False,
            norm="syncbn", act="gelu", conv_init="xavier_uniform", dtype=self.dtype,
            name="pixel_space_head_conv0",
        )(pixel_feature, train=train)
        x = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            dtype=self.dtype, name="pixel_space_head_conv1",
        )(x, train=train)
        x = ConvBN(
            128, kernel_size=1, use_bias=True, norm="syncbn", act=None,
            conv_init_std=0.01, dtype=self.dtype, name="pixel_space_head_last_conv",
        )(x, train=train)
        pixel_norm = x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-24)
        ).astype(x.dtype)

        class_logits = ConvBN(
            self.num_classes, kernel_size=1, use_bias=True, norm=None, act=None,
            conv_type="1d", conv_init_std=0.01, dtype=self.dtype,
            name="transformer_class_head",
        )(class_embeddings, train=train)
        class_logits = add_bias_towards_void(class_logits)

        mask_kernel = ConvBN(
            128, kernel_size=1, use_bias=False, norm="syncbn", act=None,
            conv_type="1d", dtype=self.dtype, name="transformer_mask_head",
        )(mask_embeddings, train=train)

        mask_logits = jnp.einsum("b...c,bnc->b...n", pixel_norm, mask_kernel)
        # BN over a single channel: normalizes the whole logit tensor with one
        # (mean, var) pair; gamma init 0.1 (ref :80-81, 98).
        mask_logits = BatchNorm(
            features=1, scale_init=nn.initializers.constant(0.1),
            dtype=self.dtype, name="pixel_space_mask_batch_norm",
        )(mask_logits[..., None], train=train)[..., 0]

        return {
            "class_logits": class_logits,
            "mask_logits": mask_logits,
            "pixel_feature": pixel_norm,
            # the 128-d mask kernels double as the per-slot embeddings used
            # for cross-clip Hungarian stitching (video predictor ref
            # maxtron_transformer_decoder.py:104-115)
            "mask_embeddings": mask_kernel,
        }


class KMaXTransformerLayer(nn.Module):
    """Dual-path layer: k-means cross-attention + query self-attention + FFN
    (ref :108-214)."""

    num_classes: int  # includes void
    base_filters: int = 128
    num_heads: int = 8
    bottleneck_expansion: float = 2.0
    key_expansion: float = 1.0
    value_expansion: float = 2.0
    drop_path_prob: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, pixel_feature, query_feature, train: bool = False):
        # pixel_feature: (B, H, W, C_pixel); query_feature: (B, N, 256)
        b = pixel_feature.shape[0]
        hw_shape = pixel_feature.shape[1:-1]
        n = query_feature.shape[1]
        bottleneck = int(round(self.base_filters * self.bottleneck_expansion))
        key_depth = int(round(self.base_filters * self.key_expansion))
        value_depth = int(round(self.base_filters * self.value_expansion))
        h = self.num_heads
        init_std = bottleneck ** -0.5

        query_space = ConvBN(
            bottleneck, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            conv_type="1d", dtype=self.dtype, name="query_conv1",
        )(query_feature, train=train)
        pixel_space = ConvBN(
            bottleneck, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            dtype=self.dtype, name="pixel_conv1",
        )(gelu(pixel_feature), train=train)

        # ---- k-means cross-attention ----------------------------------------
        pixel_value = ConvBN(
            value_depth, kernel_size=1, use_bias=False, norm="syncbn", act=None,
            conv_init_std=init_std, dtype=self.dtype, name="pixel_v_conv",
        )(pixel_space, train=train)
        prediction = KMaXPredictor(
            num_classes=self.num_classes, dtype=self.dtype, name="predictor"
        )(
            mask_embeddings=query_space,
            class_embeddings=query_space,
            pixel_feature=pixel_space,
            train=train,
        )
        mask_logits = prediction["mask_logits"].reshape(b, -1, n)  # (B, HW, N)
        # hard cluster assignment, no gradient (ref :183-194)
        assignment = jax.lax.stop_gradient(
            jax.nn.one_hot(
                jnp.argmax(mask_logits, axis=-1), n, dtype=jnp.float32, axis=-1
            )
        )  # (B, HW, N)
        kmeans_update = jnp.einsum(
            "bmn,bmd->bnd", assignment, pixel_value.reshape(b, -1, value_depth).astype(jnp.float32)
        ).astype(query_feature.dtype)
        kmeans_update = BatchNorm(
            features=value_depth, dtype=self.dtype, name="kmeans_query_batch_norm_retrieved_value",
        )(kmeans_update, train=train)
        kmeans_update = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act=None,
            conv_type="1d", norm_init=0.0, dtype=self.dtype, name="kmeans_query_conv3",
        )(kmeans_update, train=train)
        query_feature = query_feature + DropPath(self.drop_path_prob, name="drop_path_kmeans")(
            kmeans_update, deterministic=not train
        )

        # ---- query self-attention -------------------------------------------
        qkv = ConvBN(
            key_depth * 2 + value_depth, kernel_size=1, use_bias=False,
            norm="syncbn", act=None, conv_type="1d", conv_init_std=init_std,
            dtype=self.dtype, name="query_qkv_conv",
        )(query_space, train=train)
        q = qkv[..., :key_depth].reshape(b, n, h, key_depth // h)
        k = qkv[..., key_depth : 2 * key_depth].reshape(b, n, h, key_depth // h)
        v = qkv[..., 2 * key_depth :].reshape(b, n, h, value_depth // h)
        attn = AttentionOperation(
            channels_v=value_depth, num_heads=h, dtype=self.dtype, name="query_self_attention"
        )(q, k, v, train=train)
        attn = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act=None,
            conv_type="1d", norm_init=0.0, dtype=self.dtype, name="query_conv3",
        )(attn, train=train)
        query_feature = query_feature + DropPath(self.drop_path_prob, name="drop_path_attn")(
            attn, deterministic=not train
        )
        query_feature = gelu(query_feature)

        # ---- FFN ------------------------------------------------------------
        ffn = ConvBN(
            2048, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            conv_type="1d", dtype=self.dtype, name="query_ffn_conv1",
        )(query_feature, train=train)
        ffn = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act=None,
            conv_type="1d", norm_init=0.0, dtype=self.dtype, name="query_ffn_conv2",
        )(ffn, train=train)
        query_feature = query_feature + DropPath(self.drop_path_prob, name="drop_path_ffn")(
            ffn, deterministic=not train
        )
        query_feature = gelu(query_feature)

        return query_feature, prediction


class ASPP(nn.Module):
    """2-D atrous spatial pyramid pooling (ref :217-256)."""

    output_channels: int
    atrous_rates: tuple
    dropout_rate: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        r1, r2, r3 = self.atrous_rates
        results = [
            ConvBN(self.output_channels, kernel_size=1, use_bias=False,
                   norm="syncbn", act="gelu", dtype=self.dtype, name="aspp_conv0")(x, train=train),
            ConvBN(self.output_channels, kernel_size=3, dilation=r1, padding=r1, use_bias=False,
                   norm="syncbn", act="gelu", dtype=self.dtype, name="aspp_conv1")(x, train=train),
            ConvBN(self.output_channels, kernel_size=3, dilation=r2, padding=r2, use_bias=False,
                   norm="syncbn", act="gelu", dtype=self.dtype, name="aspp_conv2")(x, train=train),
            ConvBN(self.output_channels, kernel_size=3, dilation=r3, padding=r3, use_bias=False,
                   norm="syncbn", act="gelu", dtype=self.dtype, name="aspp_conv3")(x, train=train),
        ]
        pooled = jnp.mean(x, axis=(-3, -2), keepdims=True)
        pooled = ConvBN(
            self.output_channels, kernel_size=1, use_bias=False, norm="syncbn",
            act="gelu", dtype=self.dtype, name="aspp_pool",
        )(pooled, train=train)
        align_corners = x.shape[-2] % 2 == 1
        pooled = resize_bilinear(pooled, x.shape[-3:-1], align_corners=align_corners)
        results.append(pooled)
        y = jnp.concatenate(results, axis=-1)
        y = ConvBN(
            self.output_channels, kernel_size=1, use_bias=False, norm="syncbn",
            act="gelu", dtype=self.dtype, name="proj_conv",
        )(y, train=train)
        y = nn.Dropout(rate=0.1)(y, deterministic=not train)
        return y


class SemanticPredictor(nn.Module):
    """Aux semantic head: ASPP + PanopticDeepLab decoder (ref :259-313)."""

    num_classes: int  # includes void
    dtype: Any = None

    @nn.compact
    def __call__(self, x, low_features_os8, low_features_os4, train: bool = False):
        x = ASPP(output_channels=256, atrous_rates=(6, 12, 18), dtype=self.dtype, name="aspp")(
            x, train=train
        )
        align_corners = x.shape[-2] % 2 == 1

        os8 = ConvBN(64, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
                     dtype=self.dtype, name="low_level_projection_os8")(low_features_os8, train=train)
        x = resize_bilinear(x, os8.shape[-3:-1], align_corners=align_corners)
        x = jnp.concatenate([x, os8], axis=-1)
        x = ConvBN(256 + 64, kernel_size=5, padding=2, groups=256 + 64, use_bias=False,
                   norm="syncbn", act="gelu", conv_init="xavier_uniform",
                   dtype=self.dtype, name="low_level_fusion_os8_conv0")(x, train=train)
        x = ConvBN(256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
                   dtype=self.dtype, name="low_level_fusion_os8_conv1")(x, train=train)

        os4 = ConvBN(32, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
                     dtype=self.dtype, name="low_level_projection_os4")(low_features_os4, train=train)
        x = resize_bilinear(x, os4.shape[-3:-1], align_corners=align_corners)
        x = jnp.concatenate([x, os4], axis=-1)
        x = ConvBN(256 + 32, kernel_size=5, padding=2, groups=256 + 32, use_bias=False,
                   norm="syncbn", act="gelu", conv_init="xavier_uniform",
                   dtype=self.dtype, name="low_level_fusion_os4_conv0")(x, train=train)
        x = ConvBN(256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
                   dtype=self.dtype, name="low_level_fusion_os4_conv1")(x, train=train)

        x = ConvBN(256, kernel_size=5, padding=2, groups=256, use_bias=False,
                   norm="syncbn", act="gelu", conv_init="xavier_uniform",
                   dtype=self.dtype, name="conv_block_0")(x, train=train)
        x = ConvBN(256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
                   dtype=self.dtype, name="conv_block_1")(x, train=train)
        x = ConvBN(self.num_classes, kernel_size=1, use_bias=True, norm=None, act=None,
                   conv_init_std=0.01, dtype=self.dtype, name="final_conv")(x, train=train)
        return x

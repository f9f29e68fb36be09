"""Normalization layers with torch-equivalent semantics.

The reference wraps nearly every conv in ``nn.SyncBatchNorm(eps=1e-3,
momentum=0.01)`` (`kmax_pixel_decoder.py:32-37`) and additionally batch-norms
attention similarity logits (`kmax_pixel_decoder.py:122-124`). On TPU under
GSPMD, a plain batch mean over a batch-sharded array is computed globally
(XLA inserts the all-reduce), so *SyncBN == BatchNorm* here — no explicit
axis_name plumbing is required when running under jit with sharded inputs.

Semantics matched to torch:
- normalization uses biased batch variance in training;
- running stats update: ``new = (1 - momentum) * old + momentum * batch``
  with **unbiased** batch variance (torch convention);
- eval uses running stats.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-3
BN_MOMENTUM = 0.01  # torch convention: weight on the NEW batch statistic


class BatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis (inputs are channels-last).

    All leading axes are reduced. Feature axis must be the last axis.
    """

    features: int
    epsilon: float = BN_EPS
    momentum: float = BN_MOMENTUM
    use_scale: bool = True
    use_bias: bool = True
    scale_init: Any = nn.initializers.ones
    dtype: Any = None  # computation dtype for the normalized output

    @nn.compact
    def __call__(self, x, train: bool = False):
        orig_dtype = x.dtype
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # biased, for normalization
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                correction = n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * var * correction
                )
        else:
            # eval: BN is a per-channel affine — fold (mean, var, scale,
            # bias) into (s, b) in f32 once and apply in the INPUT dtype
            # (the f32 upcast/downcast round-trip over the activation was
            # a measured ~0.1 ms/ConvBN pass at stage-1 geometry)
            mean, var = ra_mean.value, ra_var.value
            s = jax.lax.rsqrt(var + self.epsilon)
            if self.use_scale:
                s = s * self.param(
                    "scale", self.scale_init, (self.features,), jnp.float32)
            b = -mean * s
            if self.use_bias:
                b = b + self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    jnp.float32)
            out_dtype = self.dtype or orig_dtype
            return (x.astype(out_dtype) * s.astype(out_dtype)
                    + b.astype(out_dtype))

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (self.features,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype or orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing feature axis, computed in fp32.

    Matches the reference ConvNeXt ``LayerNorm`` which upcasts to fp32 under
    autocast (`kmax_deeplab/modeling/backbone/convnext.py:53-84`).
    """

    features: int
    epsilon: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # f32-accumulated reductions straight off the (bf16) input: binding
        # ``xf = x.astype(f32)`` and reusing it makes XLA materialize a full
        # f32 copy of the activation (measured 0.61 ms on one ConvNeXt-L
        # downsample norm at 769x1345); per-reduce upcasts fuse instead.
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                         keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * (inv * scale) + bias
        return y.astype(self.dtype or orig_dtype)


class GroupNorm(nn.Module):
    """GroupNorm over the trailing feature axis (torch eps default 1e-5)."""

    features: int
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        g = self.num_groups
        c = self.features
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        # Per-sample stats over (*spatial, C//g) — computed WITHOUT ever
        # reshaping or upcasting the big tensor: spatial f32-reductions off
        # the (bf16) input, then a tiny per-(B, C) group fold. The previous
        # ``x.astype(f32).reshape(..., g, c//g)`` materialized an f32 copy
        # in an 8-lane tiling (C//g minor) — pure relayout cost.
        spatial_axes = tuple(range(1, x.ndim - 1))
        n_red = c // g
        for ax in spatial_axes:
            n_red *= x.shape[ax]
        s1 = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)  # (B, C)
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial_axes)
        b = s1.shape[0]
        mean_g = s1.reshape(b, g, c // g).sum(-1) / n_red      # (B, g)
        mean2_g = s2.reshape(b, g, c // g).sum(-1) / n_red
        var_g = jnp.maximum(mean2_g - jnp.square(mean_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)
        # broadcast (B, g) -> (B, C)
        mean_c = jnp.repeat(mean_g, c // g, axis=-1)
        inv_c = jnp.repeat(inv_g, c // g, axis=-1)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        w_c = (inv_c * scale).reshape(bshape)
        b_c = (bias - mean_c * inv_c * scale).reshape(bshape)
        y = x.astype(jnp.float32) * w_c + b_c
        return y.astype(self.dtype or orig_dtype)


def get_norm(kind: str | None, features: int, **kwargs) -> nn.Module | None:
    """Norm factory mirroring the reference's ``get_norm``
    (`kmax_pixel_decoder.py:32-40`): 'syncbn' -> BatchNorm(eps=1e-3, m=0.01),
    'ln' -> channels-last LayerNorm, None/'none' -> identity (None here).
    """
    if kind is None or kind.lower() == "none":
        return None
    if kind.lower() in ("syncbn", "bn"):
        return BatchNorm(features=features, **kwargs)
    if kind.lower() == "ln":
        return LayerNorm(features=features, epsilon=1e-6, **kwargs)
    if kind.lower() == "gn":
        return GroupNorm(features=features, **kwargs)
    raise ValueError(f"unknown norm {kind!r}")


class ChannelBatchNorm(nn.Module):
    """BatchNorm over an arbitrary channel axis (default 1), stats reduced
    over all other axes — the torch ``BatchNorm2d`` layout for NCHW-shaped
    intermediates. Same parameter/stat names as ``BatchNorm`` so the two are
    interchangeable in converted checkpoints; used where a channels-last
    transpose would dominate the op (axial-attention similarity logits,
    which are (N, 3h, L, M) with 3h tiny)."""

    features: int
    axis: int = 1
    epsilon: float = BN_EPS
    momentum: float = BN_MOMENTUM
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        orig_dtype = x.dtype
        axis = self.axis % x.ndim
        reduce_axes = tuple(a for a in range(x.ndim) if a != axis)
        shape = [1] * x.ndim
        shape[axis] = self.features

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                correction = n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * var * correction
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = (x.astype(jnp.float32) - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.epsilon)
        y = y * scale.reshape(shape) + bias.reshape(shape)
        return y.astype(self.dtype or orig_dtype)

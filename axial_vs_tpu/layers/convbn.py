"""ConvBN: conv (+norm) (+act) — the reference's universal building block.

Mirrors `kmax_pixel_decoder.py:43-72` (``ConvBN``): Conv2d/Conv1d with an
optional syncbn/ln norm and gelu/relu activation, with the reference's
initializer conventions (he_normal = trunc_normal(sqrt(2/in_ch)),
``norm_init`` scaling the norm's gamma — 0.0 for residual-ending convs).

TPU-native differences: channels-last layouts (NHWC / NLC), so 1-D "convs"
with kernel_size=1 are plain dense matmuls on the MXU.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.act import gelu

from ..ops.init import conv_init, trunc_normal
from ..ops.norm import get_norm


def get_activation(name: str | None):
    if name is None or name == "none":
        return lambda x: x
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return lambda x: gelu(x)
    raise ValueError(f"unknown activation {name!r}")


class ConvBN(nn.Module):
    """Channels-last conv + norm + activation.

    Works on (..., L, C) with ``conv_type='1d'`` and (..., H, W, C) with
    ``conv_type='2d'``. ``padding`` is the symmetric int padding torch uses.
    """

    out_channels: int
    kernel_size: int = 1
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    norm: str | None = None
    act: str | None = None
    conv_type: str = "2d"
    conv_init: str = "he_normal"
    conv_init_std: float | None = None  # overrides conv_init with trunc_normal(std)
    norm_init: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        ndim = 2 if self.conv_type == "2d" else 1
        ks = (self.kernel_size,) * ndim
        pad = [(self.padding, self.padding)] * ndim
        if self.conv_init_std is not None:
            kinit = trunc_normal(std=self.conv_init_std)
        else:
            kinit = conv_init(self.conv_init, in_channels)
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=ks,
            strides=(self.strides,) * ndim,
            padding=pad,
            kernel_dilation=(self.dilation,) * ndim,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        is_bn = (self.norm or "").lower() in ("syncbn", "bn")
        extra = dict(scale_init=nn.initializers.constant(self.norm_init)) if is_bn else {}
        if self.norm_init != 1.0 and not is_bn and self.norm not in (None, "none"):
            raise NotImplementedError("norm_init only wired for BN")
        norm = get_norm(self.norm, self.out_channels, name="norm", **extra)
        if norm is not None:
            y = norm(y, train=train) if is_bn else norm(y)
        return get_activation(self.act)(y)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, `kmax_pixel_decoder.py:10`)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return (x / keep) * mask.astype(x.dtype)

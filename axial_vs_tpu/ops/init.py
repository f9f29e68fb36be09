"""Parameter initializers matching the reference's timm/TF conventions.

The reference initializes conv weights with timm's ``trunc_normal_tf_``
(`kmax_pixel_decoder.py:10-11,56-64`): sample N(0,1) truncated to [-2, 2],
then scale by ``std`` (NO renormalization of the post-truncation stddev —
unlike ``jax.nn.initializers.truncated_normal`` which corrects by 1/0.8796).
``he_normal`` there is trunc_normal with std=sqrt(2/in_channels) where fan_in
counts channels only, NOT kernel taps (`kmax_pixel_decoder.py:62`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trunc_normal(std: float = 0.02, mean: float = 0.0):
    """TF/timm-style truncated normal: truncate N(0,1) at +-2, scale by std."""

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
        return (x * std + mean).astype(dtype)

    return init


def he_normal_fan_in_channels(in_channels: int):
    """Reference 'he_normal': trunc_normal(std=sqrt(2/in_channels))."""
    return trunc_normal(std=math.sqrt(2.0 / in_channels))


def conv_init(kind: str, in_channels: int):
    """Map the reference ConvBN ``conv_init`` strings to initializers.

    Kernels are stored HWIO (JAX conv convention); for xavier_uniform the
    fan_in/fan_out are computed over (kh*kw*I, kh*kw*O) exactly as torch's
    ``nn.init.xavier_uniform_`` does on an OIHW tensor.
    """
    if kind == "normal":
        def init(key, shape, dtype=jnp.float32):
            return jax.random.normal(key, shape, jnp.float32).astype(dtype) * 0.02
        return init
    if kind == "trunc_normal":
        return trunc_normal(std=0.02)
    if kind == "he_normal":
        return he_normal_fan_in_channels(in_channels)
    if kind == "xavier_uniform":
        def init(key, shape, dtype=jnp.float32):
            # shape: (*spatial, I, O) or (I, O)
            receptive = 1
            for s in shape[:-2]:
                receptive *= s
            fan_in = shape[-2] * receptive
            fan_out = shape[-1] * receptive
            limit = math.sqrt(6.0 / (fan_in + fan_out))
            return jax.random.uniform(key, shape, jnp.float32, -limit, limit).astype(dtype)
        return init
    raise ValueError(f"unknown conv_init {kind!r}")

"""Axial-trajectory attention — the paper's core temporal op, TPU-native.

Re-designs `maxtron_deeplab/modeling/within_clip_tracking_module/
temporal_attention.py:20-220` (and the cross-clip variant
`maxtron_cross_clip_tracking_module.py:78-130`):

TrajectoryAttention factorizes space-time attention into (1) a per-frame
spatial softmax that aggregates each query's *trajectory* through every
frame, and (2) a temporal softmax along the trajectory (diagonal-extracted
queries). Axial application runs it twice: on (B*W) sequences of (T*H)
tokens (height axis), then (B*H) x (T*W) (width axis) — never materializing
(THW)^2 (SURVEY.md §5's sequence-scaling mechanism #1).

All reshapes are pure layout changes batched for the MXU; softmaxes in fp32.
"""
from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.act import gelu

from ..ops.norm import LayerNorm


def xavier_uniform():
    return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)

    return init


def _dense(features, fan_in, name, dtype=None):
    return nn.Dense(
        features,
        kernel_init=xavier_uniform(),
        bias_init=torch_linear_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


class _DenseParams(nn.Module):
    """Param-owner twin of ``_dense`` ({kernel, bias}, identical name
    path, shapes, and initializers — so checkpoints/transplants are
    interchangeable with the XLA path) for weights that ride INTO the
    fused trajectory-attention kernel instead of a standalone Dense."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", xavier_uniform(),
            (self.in_features, self.features), jnp.float32)
        bias = self.param(
            "bias", torch_linear_bias_init(self.in_features),
            (self.features,), jnp.float32)
        return kernel, bias


class TrajectoryAttention(nn.Module):
    """Two-stage trajectory attention on (B, N, C), N = num_frames * n,
    tokens ordered frame-major.

    ``fused_qkv=False`` -> separate q/k/v projections, query/key may carry a
    positional embedding while value does not (within-clip variant, ref
    :20-76). ``fused_qkv=True`` -> single qkv projection (cross-clip variant,
    ref cc :78-130).
    """

    dim: int
    num_heads: int = 8
    fused_qkv: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, query, key=None, value=None, num_frames: int = 2,
                 return_attn: bool = False):
        b, n_tokens, c = query.shape
        f = num_frames
        n = n_tokens // f
        h = self.num_heads
        d = self.dim // h
        scale = d ** -0.5

        if self.fused_qkv:
            qkv = _dense(self.dim * 3, self.dim, "qkv", self.dtype)(query)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _dense(self.dim, self.dim, "q", self.dtype)(query)
            k = _dense(self.dim, self.dim, "k", self.dtype)(key)
            v = _dense(self.dim, self.dim, "v", self.dtype)(value)

        # Round-5 NEGATIVE result, kept opt-in for the record
        # (AXIALVS_FUSED_TRAJ=1): ONE Pallas kernel for everything
        # between the q/k/v and output projections (ops/traj_pallas.py),
        # keeping the (N, f, C) trajectory tensor in VMEM — ~25 XLA ops
        # collapse to 1. MEASURED SLOWER end-to-end: Tube-Link 74.9 vs
        # 83.25 fps, kMaX R50 38.8 vs 41.2, ConvNeXt-L neutral
        # (ARTIFACTS_r05 shakedown run). At these tiny axial shapes
        # (N = T*H of 50-200) XLA batches every op across ALL B' rows,
        # while the kernel's one-row grid blocks serialize f*h unrolled
        # sub-MXU dots plus 32-lane slice/concat relayouts per block —
        # the op-count win does not pay for the lost cross-row batching.
        # Parity (interpret + on-chip) pinned by tests/test_traj_pallas.py.
        if (
            not return_attn
            and jax.default_backend() == "tpu"
            and os.environ.get("AXIALVS_FUSED_TRAJ", "0") == "1"
            and n_tokens % f == 0
        ):
            from ..ops.traj_pallas import fused_trajectory_attention

            wq2, bq2 = _DenseParams(self.dim, self.dim, name="proj_q")()
            wkv2, bkv2 = _DenseParams(
                self.dim, self.dim * 2, name="proj_kv")()
            dt = q.dtype
            out = fused_trajectory_attention(
                q, k, v, wq2.astype(dt), bq2.astype(dt),
                wkv2.astype(dt), bkv2.astype(dt), f, h, scale)
            return _dense(self.dim, self.dim, "proj", self.dtype)(out)

        # head split WITHOUT head-major transposes: the einsums below index
        # h in place, so the head moves ride inside dot_general operand
        # layouts instead of materializing (profiled ~1.2 ms/clip of
        # transpose/reshape fusions in the WC temporal encoders)
        q = q.reshape(b, n_tokens, h, d)
        k = k.reshape(b, n_tokens, h, d)
        v = v.reshape(b, n_tokens, h, d)

        # stage 1: spatial softmax per frame -> per-frame trajectory aggregation
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).reshape(b, h, n_tokens, f, n)
        space_attn = jax.nn.softmax(
            (scale * logits).astype(jnp.float32), axis=-1
        ).astype(v.dtype)
        vf = v.reshape(b, f, n, h, d)
        # output directly token-major (B, N, F, h, d): no post-transpose
        traj = jnp.einsum("bhqfn,bfnhd->bqfhd", space_attn, vf)

        # stage 2: temporal attention along the trajectory
        x = traj.reshape(b, n_tokens, f, h * d)  # (B,N,F,hd)
        # diagonal: token s in frame g keeps its own frame's aggregation
        x5 = x.reshape(b, f, n, f, h * d)
        x_diag = jnp.diagonal(x5, axis1=1, axis2=3)  # (B, n, hd, F)
        x_diag = jnp.moveaxis(x_diag, -1, 1).reshape(b, n_tokens, h * d)

        q2 = _dense(self.dim, self.dim, "proj_q", self.dtype)(x_diag)
        kv2 = _dense(self.dim * 2, self.dim, "proj_kv", self.dtype)(x)
        k2, v2 = jnp.split(kv2, 2, axis=-1)
        q2 = q2.reshape(b, n_tokens, h, d) * scale
        k2 = k2.reshape(b, n_tokens, f, h, d)
        v2 = v2.reshape(b, n_tokens, f, h, d)
        t_logits = jnp.einsum("bshd,bsfhd->bshf", q2, k2)
        t_attn = jax.nn.softmax(t_logits.astype(jnp.float32), axis=-1).astype(v2.dtype)
        out = jnp.einsum("bshf,bsfhd->bshd", t_attn, v2)
        out = out.reshape(b, n_tokens, self.dim)
        out = _dense(self.dim, self.dim, "proj", self.dtype)(out)
        if return_attn:
            return out, space_attn
        return out


class TemporalAxialTrajectoryAttentionLayer(nn.Module):
    """Height-axis then width-axis trajectory attention + FFN (ref :158-220).

    src: (B*T, H*W, C); pos: (T, H, W, C) or (B, T, H, W, C).
    Returns (src, height_attn, width_attn).
    """

    d_model: int = 256
    d_ffn: int = 1024
    num_heads: int = 8
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, num_frames: int, height: int, width: int,
                 train: bool = False, return_attn: bool = False):
        t = num_frames
        bt = src.shape[0]
        b = bt // t
        c = src.shape[-1]
        if pos.ndim == 4:
            pos = jnp.broadcast_to(pos[None], (b,) + pos.shape)

        # (B*T, H*W, C) -> (B*W, T*H, C)
        x = src.reshape(b, t, height, width, c)
        x = x.transpose(0, 3, 1, 2, 4).reshape(b * width, t * height, c)
        p = pos.transpose(0, 3, 1, 2, 4).reshape(b * width, t * height, c)
        kq = x + p.astype(x.dtype)
        h_out = TrajectoryAttention(
            dim=self.d_model, num_heads=self.num_heads, dtype=self.dtype,
            name="height_attn",
        )(kq, kq, x, num_frames=t, return_attn=return_attn)
        h_attn = None
        if return_attn:
            h_out, h_attn = h_out
        x = x + h_out

        # (B*W, T*H, C) -> (B*H, T*W, C)
        x = x.reshape(b, width, t, height, c).transpose(0, 3, 2, 1, 4)
        x = x.reshape(b * height, t * width, c)
        p = p.reshape(b, width, t, height, c).transpose(0, 3, 2, 1, 4)
        p = p.reshape(b * height, t * width, c)
        kq = x + p.astype(x.dtype)
        w_out = TrajectoryAttention(
            dim=self.d_model, num_heads=self.num_heads, dtype=self.dtype,
            name="width_attn",
        )(kq, kq, x, num_frames=t, return_attn=return_attn)
        w_attn = None
        if return_attn:
            w_out, w_attn = w_out
        x = x + w_out

        # back to (B*T, H*W, C)
        x = x.reshape(b, height, t, width, c).transpose(0, 2, 1, 3, 4)
        x = x.reshape(b * t, height * width, c)

        x = LayerNorm(features=self.d_model, epsilon=1e-5, name="norm1")(x)
        y = _dense(self.d_ffn, self.d_model, "linear1", self.dtype)(x)
        y = nn.relu(y) if self.activation == "relu" else gelu(y)
        y = _dense(self.d_model, self.d_ffn, "linear2", self.dtype)(y)
        x = LayerNorm(features=self.d_model, epsilon=1e-5, name="norm2")(x + y)
        return x, h_attn, w_attn


class TemporalTrajectoryAttentionLayer(nn.Module):
    """Non-axial variant over full T*H*W tokens (ref :103-155)."""

    d_model: int = 256
    d_ffn: int = 1024
    num_heads: int = 8
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, num_frames: int, height: int, width: int,
                 train: bool = False, return_attn: bool = False):
        t = num_frames
        bt = src.shape[0]
        b = bt // t
        c = src.shape[-1]
        hw = src.shape[1]
        if pos.ndim == 4:
            pos = jnp.broadcast_to(pos[None], (b,) + pos.shape)
        x = src.reshape(b, t * hw, c)
        p = pos.reshape(b, t * hw, c)
        kq = x + p.astype(x.dtype)
        out = TrajectoryAttention(
            dim=self.d_model, num_heads=self.num_heads, dtype=self.dtype,
            name="temporal_attn",
        )(kq, kq, x, num_frames=t)
        x = (x + out).reshape(b * t, hw, c)
        x = LayerNorm(features=self.d_model, epsilon=1e-5, name="norm1")(x)
        y = _dense(self.d_ffn, self.d_model, "linear1", self.dtype)(x)
        y = nn.relu(y) if self.activation == "relu" else gelu(y)
        y = _dense(self.d_model, self.d_ffn, "linear2", self.dtype)(y)
        x = LayerNorm(features=self.d_model, epsilon=1e-5, name="norm2")(x + y)
        return x, None, None


class TemporalEncoder(nn.Module):
    """Stack of temporal layers on one feature level (ref :79-100)."""

    d_model: int = 256
    d_ffn: int = 1024
    num_heads: int = 8
    num_layers: int = 2
    temporal_attn_type: str = "axial_trajectory"
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, num_frames: int, height: int, width: int,
                 train: bool = False, return_attn: bool = False):
        h_attn = w_attn = None
        layer_cls = (
            TemporalAxialTrajectoryAttentionLayer
            if "axial" in self.temporal_attn_type
            else TemporalTrajectoryAttentionLayer
        )
        for i in range(self.num_layers):
            src, h_attn, w_attn = layer_cls(
                d_model=self.d_model, d_ffn=self.d_ffn, num_heads=self.num_heads,
                activation=self.activation, dtype=self.dtype, name=f"layer{i}",
            )(src, pos, num_frames, height, width, train=train,
              return_attn=return_attn)
        return src, h_attn, w_attn

"""Swin Transformer backbone, TPU-native NHWC.

Matches `kmax_deeplab/modeling/backbone/swin.py` (the standard Swin
implementation the reference vendors; Swin-L for Tube-Link's best VIS
results): 4x4 patch embed + LN, stages of [W-MSA / SW-MSA blocks with
relative position bias, MLP(4x, GELU)], patch merging between stages,
per-stage output LayerNorms (res2..res5 at strides 4/8/16/32).

Feature maps are padded to window multiples; shifted windows use the
standard region-id attention mask. All shapes static under jit.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.act import gelu

from ...layers.convbn import DropPath
from ...ops.init import trunc_normal
from ...ops.norm import LayerNorm


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws*ws, ws*ws) bool, True = blocked."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(
        -1, ws * ws
    )
    return win[:, :, None] != win[:, None, :]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (num_windows*B, N, C); mask: (num_windows, N, N) bool or None
        bnw, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, kernel_init=trunc_normal(0.02),
            dtype=self.dtype, name="qkv",
        )(x).reshape(bnw, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * (d ** -0.5), k)

        table = self.param(
            "relative_position_bias_table", trunc_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h), jnp.float32,
        )
        idx = relative_position_index(self.window_size)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, h)
        logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)

        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(bnw // nw, nw, h, n, n)
            logits = jnp.where(
                jnp.asarray(mask)[None, :, None], -1e9, logits.astype(jnp.float32)
            ).reshape(bnw, h, n, n)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(
            c, kernel_init=trunc_normal(0.02), dtype=self.dtype, name="proj"
        )(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_prob: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        ws = self.window_size
        pad_h = (ws - hh % ws) % ws
        pad_w = (ws - ww % ws) % ws
        shortcut = x

        y = LayerNorm(features=c, epsilon=1e-5, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = hh + pad_h, ww + pad_w
        # the reference shifts even when hp == ws (the region mask handles
        # the wrap-around), so no min-size clamping here (swin.py:258-263)
        shift = self.shift
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = shifted_window_mask(hp, wp, ws, shift)
        else:
            mask = None
        windows = window_partition(y, ws)
        attn = WindowAttention(
            dim=c, num_heads=self.num_heads, window_size=ws,
            qkv_bias=self.qkv_bias, dtype=self.dtype, name="attn",
        )(windows, mask)
        y = window_reverse(attn, ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :hh, :ww]
        x = shortcut + DropPath(self.drop_path_prob, name="drop_path")(
            y, deterministic=not train
        )

        y = LayerNorm(features=c, epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(c, kernel_init=trunc_normal(0.02), dtype=self.dtype,
                     name="mlp_fc2")(y)
        return x + DropPath(self.drop_path_prob, name="drop_path2")(
            y, deterministic=not train
        )


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.embed_dim, (4, 4), strides=(4, 4),
            kernel_init=trunc_normal(0.02), dtype=self.dtype, name="patch_embed",
        )(x)
        if self.patch_norm:
            x = LayerNorm(features=self.embed_dim, epsilon=1e-5, name="patch_norm")(x)

        dp = np.linspace(0, self.drop_path_rate, sum(self.depths))
        out = {}
        cur = 0
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[si],
                    window_size=self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path_prob=float(dp[cur + bi]), dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train=train)
            cur += depth
            name = f"res{si + 2}"
            if name in self.out_features:
                out[name] = LayerNorm(
                    features=dim, epsilon=1e-5, name=f"out_norm{si}"
                )(x)
            if si < len(self.depths) - 1:
                # patch merging: 2x2 neighborhood concat -> LN -> linear 2C
                b, hh, ww, c = x.shape
                pad_h, pad_w = hh % 2, ww % 2
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                     x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
                )
                x = LayerNorm(features=4 * c, epsilon=1e-5, name=f"merge_norm{si}")(x)
                x = nn.Dense(2 * c, use_bias=False, kernel_init=trunc_normal(0.02),
                             dtype=self.dtype, name=f"merge_reduction{si}")(x)
                dim *= 2
        return out

"""ViTAEv2-VSA backbone, TPU-native NHWC.

Rebuilds the reference's ViTAEv2 with Varied-Size-window Attention
(`MaXTron_Tube-Link/mmdet/models/backbones/vitaev2_vsa.py:62-204` and
`.../vitaev2_vsa_modules/{ReductionCell.py,NormalCell.py,window.py}`), the
third non-stock backbone the Tube-Link half registers (alongside ConvNeXt
and STDC). Only the VSA token type is implemented — it is the default and
the only one any ViTAEv2 recipe selects (`vitaev2_vsa.py:74-75`); the
performer/transformer/window token types are dead upstream variants.

Structure per stage: a ReductionCell (multi-dilation PRM patch embedding +
VSA window attention + parallel PCM conv branch + MLP) followed by
NC_depth NormalCells (VSA attention + PCM branch + MLP). VSA attention
predicts per-window scale/offset of the sampling grid for K/V
(`window.py:207-288`) and samples via bilinear grid_sample
(align_corners=True, zeros padding).

TPU notes: everything is static-shaped; the K/V resampling is one flat
row-gather per bilinear corner (`ops/grid_sample.py`); attention softmax in
fp32; channels-last throughout.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.act import gelu

from ...layers.convbn import DropPath
from ...ops.grid_sample import grid_sample_bilinear
from ...ops.init import trunc_normal
from ...ops.norm import BatchNorm, LayerNorm
from .swin import relative_position_index


class PRM(nn.Module):
    """Parallel (pyramid) Reduction Module: multi-dilation strided convs,
    GELU, channel concat (`ReductionCell.py:12-66`, op='cat').

    ``extra_pad`` mirrors the reference's `+1` when the construction-time
    image size is not divisible by the ratio (`ReductionCell.py:32-33`).
    """

    embed_dim: int
    kernel_size: int
    downsample_ratio: int
    dilations: Sequence[int]
    extra_pad: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        outs = []
        s = self.downsample_ratio
        k = self.kernel_size
        for j, d in enumerate(self.dilations):
            p = math.ceil(((k - 1) * d + 1 - s) / 2) + int(self.extra_pad)
            y = nn.Conv(
                self.embed_dim, (k, k), strides=(s, s),
                padding=((p, p), (p, p)), kernel_dilation=(d, d),
                kernel_init=trunc_normal(0.02), dtype=self.dtype,
                name=f"conv{j}",
            )(x)
            outs.append(gelu(y))
        return jnp.concatenate(outs, axis=-1)


class PCM(nn.Module):
    """Parallel Convolution Module: conv-BN-SiLU x2 + conv
    (`ReductionCell.py:102-121`, `NormalCell.py:152-160`). torch BN defaults
    (eps=1e-5, momentum=0.1)."""

    features: Sequence[int]  # 3 output widths
    strides: Sequence[int] = (1, 1, 1)
    group: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, s) in enumerate(zip(self.features, self.strides)):
            x = nn.Conv(
                f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                feature_group_count=self.group,
                kernel_init=trunc_normal(0.02), dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if i < 2:
                x = BatchNorm(features=f, epsilon=1e-5, momentum=0.1,
                              name=f"bn{i}")(x, train=train)
                x = nn.silu(x)
        return x


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.out, kernel_init=trunc_normal(0.02),
                        dtype=self.dtype, name="fc2")(x)


class VSAWindowAttention(nn.Module):
    """Varied-Size window Attention (`window.py:156-288`).

    Per window, a tiny head (avg-pool + LeakyReLU + 1x1 conv) predicts a 2-D
    scale and offset of the sampling grid; K/V are bilinearly resampled at
    the transformed grid (align_corners=True, zeros padding) while Q stays
    on the regular window. Relative position bias as in Swin.
    """

    dim: int           # input channels (sets the qk scale, window.py:164)
    out_dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        ws = self.window_size
        m = self.num_heads
        hd = self.out_dim // m
        scale = (self.dim // m) ** -0.5

        pad_td = (ws - h % ws) % ws
        pad_lr = (ws - w % ws) % ws
        pt, pl = pad_td // 2, pad_lr // 2
        pd, pr = pad_td - pt, pad_lr - pl
        eh, ew = h + pad_td, w + pad_lr
        wnh, wnw = eh // ws, ew // ws

        x_pad = jnp.pad(x, ((0, 0), (pt, pd), (pl, pr), (0, 0)))

        # --- predicted per-window grid transform (window.py:246-259) -----
        pooled = x_pad.reshape(b, wnh, ws, wnw, ws, -1).mean(axis=(2, 4))
        pooled = nn.leaky_relu(pooled, negative_slope=0.01)

        def head_conv(name):
            y = nn.Dense(2 * m, kernel_init=trunc_normal(0.02),
                         dtype=self.dtype, name=name)(pooled)
            return y.reshape(b, wnh, wnw, m, 2).transpose(0, 3, 1, 2, 4)

        # offsets (only) get divided: component 0 by h//ws and component 1
        # by w//ws (window.py:252-253) — replicated verbatim
        offsets = head_conv("sampling_offsets") / jnp.asarray(
            [h // ws, w // ws], jnp.float32)       # (b, m, wnh, wnw, 2)
        scales = head_conv("sampling_scales")

        # base grid: per-pixel image reference (x, y) in [-1, 1] plus the
        # window-centered base coords scaled/offset per window
        lin_h = np.linspace(-1.0, 1.0, eh, dtype=np.float32)
        lin_w = np.linspace(-1.0, 1.0, ew, dtype=np.float32)
        img_ref = np.stack(
            [np.broadcast_to(lin_w[None, :], (eh, ew)),
             np.broadcast_to(lin_h[:, None], (eh, ew))], axis=-1,
        ).reshape(wnh, ws, wnw, ws, 2)
        bh = np.arange(ws, dtype=np.float32) * 2.0 / (eh - 1)
        bh -= bh.mean()
        bw = np.arange(ws, dtype=np.float32) * 2.0 / (ew - 1)
        bw -= bw.mean()
        win_ref = np.stack(
            [np.broadcast_to(bw[None, :], (ws, ws)),
             np.broadcast_to(bh[:, None], (ws, ws))], axis=-1,
        )[None, :, None]  # (1, ws, 1, ws, 2)

        coords = (
            jnp.asarray(img_ref)[None, None]
            + jnp.asarray(win_ref)[None, None] * scales[:, :, :, None, :, None]
            + offsets[:, :, :, None, :, None]
        )  # (b, m, wnh, ws, wnw, ws, 2)
        grid = coords.reshape(b * m, eh, ew, 2)

        # --- qkv on the unpadded input, pad after (window.py:261-262) ----
        qkv = nn.Dense(3 * self.out_dim, kernel_init=trunc_normal(0.02),
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h, w, 3, m, hd)
        qkv = jnp.pad(qkv, ((0, 0), (pt, pd), (pl, pr), (0, 0), (0, 0), (0, 0)))
        q = qkv[:, :, :, 0]
        k = qkv[:, :, :, 1].transpose(0, 3, 1, 2, 4).reshape(b * m, eh, ew, hd)
        v = qkv[:, :, :, 2].transpose(0, 3, 1, 2, 4).reshape(b * m, eh, ew, hd)

        k_sel = grid_sample_bilinear(k, grid, align_corners=True)
        v_sel = grid_sample_bilinear(v, grid, align_corners=True)

        def windows_from_bhw(t):  # (b, eh, ew, m, hd) -> (b*wn, m, ws*ws, hd)
            t = t.reshape(b, wnh, ws, wnw, ws, m, hd)
            return t.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
                b * wnh * wnw, m, ws * ws, hd)

        def windows_from_bm(t):   # (b*m, eh, ew, hd) -> (b*wn, m, ws*ws, hd)
            t = t.reshape(b, m, wnh, ws, wnw, ws, hd)
            return t.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
                b * wnh * wnw, m, ws * ws, hd)

        qw = windows_from_bhw(q)
        kw = windows_from_bm(k_sel)
        vw = windows_from_bm(v_sel)

        dots = jnp.einsum("bmnd,bmkd->bmnk", qw * scale, kw)
        table = self.param(
            "relative_position_bias_table", trunc_normal(0.02),
            ((2 * ws - 1) ** 2, m), jnp.float32,
        )
        idx = relative_position_index(ws)
        # jnp.take: `table` may be a raw numpy array when params come from
        # the torch converter; numpy fancy-indexing rejects traced indices
        bias = jnp.take(jnp.asarray(table), idx.reshape(-1), axis=0).reshape(
            ws * ws, ws * ws, m)
        dots = dots + bias.transpose(2, 0, 1)[None].astype(dots.dtype)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(vw.dtype)
        out = jnp.einsum("bmnk,bmkd->bmnd", attn, vw)

        out = out.reshape(b, wnh, wnw, m, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, eh, ew, self.out_dim)
        out = out[:, pt:pt + h, pl:pl + w]
        return nn.Dense(self.out_dim, kernel_init=trunc_normal(0.02),
                        dtype=self.dtype, name="proj")(out)


class ReductionCellVSA(nn.Module):
    """ReductionCell, VSA token type (`ReductionCell.py:68-223`)."""

    in_chans: int
    embed_dim: int
    token_dim: int
    downsample_ratio: int
    kernel_size: int
    num_heads: int
    dilations: Sequence[int]
    group: int = 1
    wide_pcm: bool = False
    extra_pad: bool = False
    window_size: int = 7
    drop_path_prob: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        prm = PRM(
            embed_dim=self.embed_dim, kernel_size=self.kernel_size,
            downsample_ratio=self.downsample_ratio, dilations=self.dilations,
            extra_pad=self.extra_pad, dtype=self.dtype, name="prm",
        )(x)
        prm_c = self.embed_dim * len(self.dilations)

        # RC norms are plain nn.LayerNorm -> torch default eps 1e-5
        y = LayerNorm(features=prm_c, epsilon=1e-5, name="norm1")(prm)
        y = VSAWindowAttention(
            dim=prm_c, out_dim=self.token_dim, num_heads=self.num_heads,
            window_size=self.window_size, dtype=self.dtype, name="attn",
        )(y)

        residual = self.downsample_ratio // 2
        strides = []
        for _ in range(3):
            strides.append(int(residual > 0) + 1)
            residual //= 2
        wide = self.token_dim * 2
        feats = ((wide, wide, self.token_dim) if self.wide_pcm
                 else (self.embed_dim, self.embed_dim, self.token_dim))
        conv = PCM(features=feats, strides=tuple(strides), group=self.group,
                   dtype=self.dtype, name="pcm")(shortcut, train=train)

        drop = DropPath(self.drop_path_prob, name="drop_path")
        x = y + drop(conv, deterministic=not train)
        z = LayerNorm(features=self.token_dim, epsilon=1e-5, name="norm2")(x)
        z = Mlp(hidden=self.token_dim, out=self.token_dim, dtype=self.dtype,
                name="mlp")(z)  # RC mlp_ratio defaults to 1.0
        return x + drop(z, deterministic=not train)


class NormalCellVSA(nn.Module):
    """NormalCell, VSA token type (`NormalCell.py:112-253`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    group: int = 64
    window_size: int = 7
    drop_path_prob: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        # NC norms use the backbone norm_layer: LayerNorm(eps=1e-6)
        y = LayerNorm(features=self.dim, epsilon=1e-6, name="norm1")(x)
        y = VSAWindowAttention(
            dim=self.dim, out_dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size, dtype=self.dtype, name="attn",
        )(y)
        hidden = int(self.dim * self.mlp_ratio)
        conv = PCM(features=(hidden, self.dim, self.dim), group=self.group,
                   dtype=self.dtype, name="pcm")(shortcut, train=train)
        drop = DropPath(self.drop_path_prob, name="drop_path")
        x = (shortcut + drop(y, deterministic=not train)
             + drop(conv, deterministic=not train))
        z = LayerNorm(features=self.dim, epsilon=1e-6, name="norm2")(x)
        z = Mlp(hidden=hidden, out=self.dim, dtype=self.dtype, name="mlp")(z)
        return x + drop(z, deterministic=not train)


class ViTAEv2VSA(nn.Module):
    """4-stage ViTAEv2-VSA (`vitaev2_vsa.py:62-204`), defaults = ViTAEv2-S.

    Input NHWC image; returns {res2..res5} NHWC at strides 4/8/16/32.
    """

    embed_dims: Sequence[int] = (64, 64, 64, 64)
    token_dims: Sequence[int] = (64, 128, 256, 512)
    downsample_ratios: Sequence[int] = (4, 2, 2, 2)
    kernel_sizes: Sequence[int] = (7, 3, 3, 3)
    rc_heads: Sequence[int] = (1, 1, 1, 1)
    nc_heads: Sequence[int] = (4, 4, 4, 4)
    dilations: Sequence[Sequence[int]] = ((1, 2, 3, 4), (1, 2, 3), (1, 2), (1, 2))
    rc_groups: Sequence[int] = (1, 1, 1, 1)
    nc_groups: Sequence[int] = (1, 32, 64, 64)
    nc_depths: Sequence[int] = (2, 2, 6, 2)
    mlp_ratio: float = 4.0
    window_size: int = 7
    wide_pcm: bool = False
    drop_path_rate: float = 0.0
    img_size: int = 224  # only sets PRM's +1-padding rule, as in the reference
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth = sum(self.nc_depths)
        dp = np.linspace(0, self.drop_path_rate, depth)
        out = {}
        in_chans = x.shape[-1]
        img_size = self.img_size
        for i in range(4):
            # the reference's (non-cumulative) dpr slicing, vitaev2_vsa.py:128
            start = 0 if i == 0 else self.nc_depths[i - 1]
            x = ReductionCellVSA(
                in_chans=in_chans, embed_dim=self.embed_dims[i],
                token_dim=self.token_dims[i],
                downsample_ratio=self.downsample_ratios[i],
                kernel_size=self.kernel_sizes[i], num_heads=self.rc_heads[i],
                dilations=self.dilations[i], group=self.rc_groups[i],
                wide_pcm=self.wide_pcm,
                extra_pad=img_size % self.downsample_ratios[i] != 0,
                window_size=self.window_size,
                drop_path_prob=0.0, dtype=self.dtype,
                name=f"stage{i}_rc",
            )(x, train=train)
            for j in range(self.nc_depths[i]):
                x = NormalCellVSA(
                    dim=self.token_dims[i], num_heads=self.nc_heads[i],
                    mlp_ratio=self.mlp_ratio, group=self.nc_groups[i],
                    window_size=self.window_size,
                    drop_path_prob=float(dp[start + j]), dtype=self.dtype,
                    name=f"stage{i}_nc{j}",
                )(x, train=train)
            img_size //= self.downsample_ratios[i]
            in_chans = self.token_dims[i]
            name = f"res{i + 2}"
            if name in self.out_features:
                out[name] = x
        return out

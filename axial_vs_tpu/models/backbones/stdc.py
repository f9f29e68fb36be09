"""STDC backbone (STDC1/STDC2), TPU-native NHWC.

Matches `MaXTron_Tube-Link/mmdet/models/backbones/stdc.py`: ConvX
(conv->BN->relu, :295-303), CatBottleneck (:245-292) / AddBottleneck
(:195-242) with the short-term dense concat topology, STDCNet813 = STDC1
(layers 2/2/2) and STDCNet1446 = STDC2 (layers 4/5/3), both base=64,
block_num=4, returning strides 4/8/16/32 with channels 64/256/512/1024
(`configs/video/vipseg/vipseg_tb_stdcv1_8e.py:23`).

SyncBN in the reference is plain BatchNorm here: under a batch-sharded jit,
GSPMD computes batch statistics with cross-device collectives automatically.
BN eps is the torch default 1e-5 (these nets predate the deeplab2 1e-3
convention used elsewhere in this repo).
The classifier tail the reference instantiates then deletes (:40-48) is
simply never built.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.norm import BatchNorm

STDC_LAYERS = {"stdc1": (2, 2, 2), "stdc2": (4, 5, 3)}


class ConvX(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            use_bias=False,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            dtype=self.dtype, name="conv",
        )(x)
        x = BatchNorm(features=self.features, epsilon=1e-5, dtype=self.dtype,
                      name="bn")(
            x, train=train
        )
        return nn.relu(x)


class _DWConvNorm(nn.Module):
    """3x3 stride-2 depthwise conv + BN (the avd/skip pieces)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            feature_group_count=self.features, use_bias=False,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            dtype=self.dtype, name="conv",
        )(x)
        return BatchNorm(features=self.features, epsilon=1e-5, dtype=self.dtype,
                         name="bn")(
            x, train=train
        )


def _branch_channels(out_planes: int, block_num: int) -> Sequence[int]:
    # idx 0 -> out/2, idx 1 -> out/4, ..., last idx repeats the previous
    # width so the concat sums back to out_planes (reference :263-271).
    chans = []
    for idx in range(block_num):
        if idx == 0:
            chans.append(out_planes // 2)
        elif idx < block_num - 1:
            chans.append(out_planes // (2 ** (idx + 1)))
        else:
            chans.append(out_planes // (2 ** idx))
    return chans


class CatBottleneck(nn.Module):
    out_planes: int
    block_num: int = 4
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = _branch_channels(self.out_planes, self.block_num)
        out1 = ConvX(chans[0], kernel=1, dtype=self.dtype, name="conv0")(
            x, train=train
        )
        outs = []
        y = out1
        for idx in range(1, self.block_num):
            if idx == 1 and self.stride == 2:
                y = _DWConvNorm(chans[0], dtype=self.dtype, name="avd")(
                    y, train=train
                )
            y = ConvX(chans[idx], dtype=self.dtype, name=f"conv{idx}")(
                y, train=train
            )
            outs.append(y)
        if self.stride == 2:
            # torch AvgPool2d(3, 2, padding=1) default count_include_pad=True
            out1 = nn.avg_pool(
                out1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                count_include_pad=True,
            )
        return jnp.concatenate([out1] + outs, axis=-1)


class AddBottleneck(nn.Module):
    out_planes: int
    block_num: int = 4
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = _branch_channels(self.out_planes, self.block_num)
        outs = []
        y = x
        for idx in range(self.block_num):
            y = ConvX(
                chans[idx], kernel=1 if idx == 0 else 3, dtype=self.dtype,
                name=f"conv{idx}",
            )(y, train=train)
            if idx == 0 and self.stride == 2:
                y = _DWConvNorm(chans[0], dtype=self.dtype, name="avd")(
                    y, train=train
                )
            outs.append(y)
        if self.stride == 2:
            in_planes = x.shape[-1]
            x = _DWConvNorm(in_planes, dtype=self.dtype, name="skip_dw")(
                x, train=train
            )
            x = nn.Conv(
                self.out_planes, (1, 1), use_bias=False,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                dtype=self.dtype, name="skip_pw",
            )(x)
            x = BatchNorm(
                features=self.out_planes, epsilon=1e-5, dtype=self.dtype,
                name="skip_bn",
            )(x, train=train)
        return jnp.concatenate(outs, axis=-1) + x


class STDCNet(nn.Module):
    """Returns dict res2..res5 (strides 4/8/16/32, channels 64/256/512/1024
    at base=64)."""

    base: int = 64
    layers: Sequence[int] = (4, 5, 3)  # stdc2; stdc1 = (2, 2, 2)
    block_num: int = 4
    block_type: str = "cat"  # "cat" | "add"
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = CatBottleneck if self.block_type == "cat" else AddBottleneck
        x = ConvX(self.base // 2, stride=2, dtype=self.dtype, name="stem0")(
            x, train=train
        )
        x = ConvX(self.base, stride=2, dtype=self.dtype, name="stem1")(
            x, train=train
        )
        out = {"res2": x}  # feat4 (stride 4, base channels)
        for i, n_blocks in enumerate(self.layers):
            planes = self.base * (2 ** (i + 2))
            for j in range(n_blocks):
                x = block(
                    out_planes=planes, block_num=self.block_num,
                    stride=2 if j == 0 else 1, dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, train=train)
            out[f"res{i + 3}"] = x
        return {k: v for k, v in out.items() if k in self.out_features}

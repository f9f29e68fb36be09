"""ResNet backbone, TPU-native NHWC.

Matches the reference's `custom_bn_build_resnet_backbone`
(`kmax_deeplab/modeling/backbone/resnet.py:617-699`): torchvision-style
ResNet with the deeplab2 BN settings (SyncBN eps=1e-3, momentum=0.01 via the
shared ``get_norm``), basic 7x7 stem + maxpool, bottleneck blocks with
STRIDE_IN_1X1=False (stride on the 3x3, as torchvision), out features
res2..res5.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.norm import BatchNorm

NUM_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class _ConvNorm(nn.Module):
    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(features=self.features, dtype=self.dtype, name="norm")(
            x, train=train
        )


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = _ConvNorm(
                self.out_channels, 1, strides=self.stride, dtype=self.dtype,
                name="shortcut",
            )(x, train=train)
        y = _ConvNorm(
            self.bottleneck_channels, 1, dtype=self.dtype, name="conv1"
        )(x, train=train)
        y = nn.relu(y)
        y = _ConvNorm(
            self.bottleneck_channels, 3, strides=self.stride,
            padding=self.dilation, dilation=self.dilation, dtype=self.dtype,
            name="conv2",
        )(y, train=train)
        y = nn.relu(y)
        y = _ConvNorm(self.out_channels, 1, dtype=self.dtype, name="conv3")(
            y, train=train
        )
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = _ConvNorm(
                self.out_channels, 1, strides=self.stride, dtype=self.dtype,
                name="shortcut",
            )(x, train=train)
        y = _ConvNorm(
            self.out_channels, 3, strides=self.stride, padding=1, dtype=self.dtype,
            name="conv1",
        )(x, train=train)
        y = nn.relu(y)
        y = _ConvNorm(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(
            y, train=train
        )
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """Returns a dict res2..res5 of NHWC features (strides 4/8/16/32)."""

    depth: int = 50
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    res5_dilation: int = 1
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks_per_stage = NUM_BLOCKS[self.depth]
        use_basic = self.depth in (18, 34)

        # stem: 7x7/2 + 3x3 maxpool/2
        y = _ConvNorm(
            self.stem_out_channels, 7, strides=2, padding=3, dtype=self.dtype,
            name="stem",
        )(x, train=train)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        out = {}
        out_channels = self.res2_out_channels if not use_basic else 64
        bottleneck_channels = 64
        for idx, stage in enumerate(("res2", "res3", "res4", "res5")):
            dilation = self.res5_dilation if stage == "res5" else 1
            first_stride = 1 if idx == 0 or (stage == "res5" and dilation == 2) else 2
            for b in range(blocks_per_stage[idx]):
                stride = first_stride if b == 0 else 1
                if use_basic:
                    y = BasicBlock(
                        out_channels, stride=stride, dtype=self.dtype,
                        name=f"{stage}_block{b}",
                    )(y, train=train)
                else:
                    y = BottleneckBlock(
                        out_channels, bottleneck_channels, stride=stride,
                        dilation=dilation, dtype=self.dtype, name=f"{stage}_block{b}",
                    )(y, train=train)
            if stage in self.out_features:
                out[stage] = y
            out_channels *= 2
            bottleneck_channels *= 2
        return out

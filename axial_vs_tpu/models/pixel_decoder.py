"""kMaX axial-attention pixel decoder, TPU-native.

Re-designs `kmax_deeplab/modeling/pixel_decoder/kmax_pixel_decoder.py`
(`SingleBlock` :194-232, `BlockGroup` :236-256, `ResizedFuse` :260-285,
`kMaXPixelDecoder` :288-371) on channels-last NHWC features.

The decoder consumes backbone features res5..res2 (sorted low->high
resolution), runs a BlockGroup of axial/bottleneck residual blocks per stage
and fuses upsampled outputs with the next stage's (LayerNorm'ed) features.
Returns (panoptic_features OS4, semantic_feature_triple, multi_scale
[OS32, OS16, OS8]).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.act import gelu

from ..layers.axial_attention import AxialAttention2D
from ..layers.convbn import ConvBN, DropPath
from ..ops.norm import LayerNorm
from ..ops.resize import resize_bilinear


class SingleBlock(nn.Module):
    """Residual block: 1x1 -> (axial attention | 3x3) -> 1x1, BN-scaled 0 end."""

    filter_list: Sequence[int]
    block_type: str  # 'axial' | 'bottleneck'
    query_shape: tuple = (56, 56)
    key_expansion: float = 1.0
    value_expansion: float = 2.0
    num_heads: int = 8
    drop_path_prob: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = gelu(x)
        shortcut = x
        if x.shape[-1] != self.filter_list[-1]:
            shortcut = ConvBN(
                self.filter_list[-1], kernel_size=1, use_bias=False, norm="syncbn",
                act=None, dtype=self.dtype, name="shortcut",
            )(shortcut, train=train)

        y = ConvBN(
            self.filter_list[0], kernel_size=1, use_bias=False, norm="syncbn",
            act="gelu", dtype=self.dtype, name="conv1_bn_act",
        )(x, train=train)
        if self.block_type == "axial":
            y = AxialAttention2D(
                query_shape=tuple(self.query_shape), filters=self.filter_list[1],
                key_expansion=self.key_expansion, value_expansion=self.value_expansion,
                num_heads=self.num_heads, dtype=self.dtype, name="attention",
            )(y, train=train)
            y = gelu(y)
        elif self.block_type == "bottleneck":
            y = ConvBN(
                self.filter_list[1], kernel_size=3, padding=1, use_bias=False,
                norm="syncbn", act="gelu", dtype=self.dtype, name="conv2_bn_act",
            )(y, train=train)
        else:
            raise ValueError(f"unknown block type {self.block_type!r}")
        y = ConvBN(
            self.filter_list[2], kernel_size=1, use_bias=False, norm="syncbn",
            act=None, norm_init=0.0, dtype=self.dtype, name="conv3_bn",
        )(y, train=train)
        y = DropPath(self.drop_path_prob, name="drop_path")(y, deterministic=not train)
        return y + shortcut


class BlockGroup(nn.Module):
    """num_blocks SingleBlocks; filter_list per deeplab2 conventions
    (axial: [2f, f, 4f]; bottleneck: [f, f, 4f], ref :236-251)."""

    base_filter: int
    num_blocks: int
    block_type: str
    query_shape: tuple = (56, 56)
    key_expansion: float = 1.0
    value_expansion: float = 2.0
    num_heads: int = 8
    drop_path_prob: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bt = self.block_type.lower()
        if bt == "axial":
            filter_list = [self.base_filter * 2, self.base_filter, self.base_filter * 4]
        else:
            filter_list = [self.base_filter, self.base_filter, self.base_filter * 4]
        for i in range(self.num_blocks):
            x = SingleBlock(
                filter_list=filter_list, block_type=bt, query_shape=self.query_shape,
                key_expansion=self.key_expansion, value_expansion=self.value_expansion,
                num_heads=self.num_heads, drop_path_prob=self.drop_path_prob,
                dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
        return x


class ResizedFuse(nn.Module):
    """Upsample low-res features and add to (projected) high-res features
    (ref :260-285). align_corners follows the odd-size convention."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, lowres_x, highres_x, train: bool = False):
        align_corners = lowres_x.shape[-2] % 2 == 1
        if lowres_x.shape[-1] != self.out_channels:
            lowres_x = gelu(lowres_x)
            lowres_x = ConvBN(
                self.out_channels, kernel_size=1, use_bias=False, norm="syncbn",
                act=None, dtype=self.dtype, name="conv_bn_low",
            )(lowres_x, train=train)
        lowres_x = resize_bilinear(
            lowres_x, highres_x.shape[-3:-1], align_corners=align_corners
        )
        if highres_x.shape[-1] != self.out_channels:
            highres_x = gelu(highres_x)
            highres_x = ConvBN(
                self.out_channels, kernel_size=1, use_bias=False, norm="syncbn",
                act=None, dtype=self.dtype, name="conv_bn_high",
            )(highres_x, train=train)
        return lowres_x + highres_x


class KMaXPixelDecoder(nn.Module):
    """Multi-stage axial decoder over backbone features (ref :288-371).

    ``in_features`` are ordered low->high resolution (res5 first).
    ``spatial_shape`` is the padded input (H, W) used to derive per-stage
    axial query shapes: ``size//stride + (size % 2)`` (ref :312-318).
    """

    in_features: Sequence[str] = ("res5", "res4", "res3", "res2")
    dec_layers: Sequence[int] = (1, 5, 1, 1)
    dec_channels: Sequence[int] = (512, 256, 128, 64)
    layer_types: Sequence[str] = ("axial", "axial", "bottleneck", "bottleneck")
    drop_path_prob: float = 0.0
    spatial_shape: tuple = (1281, 1281)
    dtype: Any = None

    @nn.compact
    def __call__(self, features: dict, train: bool = False):
        num_stages = len(self.in_features)
        add_one = (self.spatial_shape[0] % 2, self.spatial_shape[1] % 2)
        strides = (32, 16, 8, 4, 2)
        query_shapes = [
            (
                self.spatial_shape[0] // strides[i] + add_one[0],
                self.spatial_shape[1] // strides[i] + add_one[1],
            )
            for i in range(num_stages)
        ]

        out = []
        x = LayerNorm(
            features=features[self.in_features[0]].shape[-1], name="in_norm0"
        )(features[self.in_features[0]])
        for idx in range(num_stages - 1):
            x = BlockGroup(
                base_filter=self.dec_channels[idx],
                num_blocks=self.dec_layers[idx],
                block_type=self.layer_types[idx],
                query_shape=query_shapes[idx],
                drop_path_prob=self.drop_path_prob,
                dtype=self.dtype,
                name=f"stage{idx}",
            )(x, train=train)
            out.append(x)
            high = features[self.in_features[idx + 1]]
            high = LayerNorm(features=high.shape[-1], name=f"in_norm{idx + 1}")(high)
            x = ResizedFuse(
                out_channels=self.dec_channels[idx + 1],
                dtype=self.dtype,
                name=f"resized_fuse{idx}",
            )(lowres_x=x, highres_x=high, train=train)

        x = BlockGroup(
            base_filter=self.dec_channels[-1],
            num_blocks=self.dec_layers[-1],
            block_type=self.layer_types[-1],
            query_shape=query_shapes[num_stages - 1],
            drop_path_prob=self.drop_path_prob,
            dtype=self.dtype,
            name=f"stage{num_stages - 1}",
        )(x, train=train)
        out.append(x)

        multi_scale_features = out[:3]  # OS32, OS16, OS8 for the transformer decoder
        panoptic_features = out[-1]  # OS4
        semantic_features = [
            features[self.in_features[0]],  # OS32 raw
            features[self.in_features[2]],  # OS8 raw
            features[self.in_features[3]],  # OS4 raw
        ]
        return panoptic_features, semantic_features, multi_scale_features

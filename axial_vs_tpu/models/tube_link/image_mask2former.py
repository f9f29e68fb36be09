"""Image Mask2Former (COCO pretrain for Tube-Link, T9).

Re-designs `MaXTron_Tube-Link/models/image/mask2former/*` (Mask2Former +
head without stuff matching): the tube head with ``num_frames=1`` IS image
Mask2Former — masks (B, 1, Q, H, W) squeeze to images, the criterion's tube
point-sampling degenerates to per-image sampling. This alias keeps the
config surface explicit.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .head import Mask2FormerVideoHeadTube


class ImageMask2Former(nn.Module):
    backbone: nn.Module
    num_things_classes: int = 80
    num_stuff_classes: int = 53
    num_queries: int = 100
    use_temporal_attn: bool = False  # image: no temporal levels
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False, return_query: bool = False):
        feats = self.backbone(images, train=train)
        out = Mask2FormerVideoHeadTube(
            num_things_classes=self.num_things_classes,
            num_stuff_classes=self.num_stuff_classes,
            num_queries=self.num_queries,
            num_frames=1,
            use_temporal_attn=self.use_temporal_attn,
            dtype=self.dtype,
            name="head",
        )(feats, train=train, return_query=return_query)
        # (B, 1, Q, H, W) -> (B, Q, H, W)
        out["mask_preds"] = [m[:, 0] for m in out["mask_preds"]]
        return out

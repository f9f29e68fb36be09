"""kMaX-DeepLab / MaXTron segmenter module + builder.

The nn.Module covers both the image meta-arch (`kmax_deeplab/kmax_model.py`,
`kMaXDeepLab`) and the within-clip video meta-arch
(`maxtron_deeplab/maxtron_wc_model.py`, `MaXTronWCDeepLab`): the only
difference in the network itself is ``num_frames`` (clip folding in the
transformer decoder) and the optional within-clip tracking module between
backbone and pixel decoder (`maxtron_deeplab/modeling/meta_arch/
maxtron_deeplab_head.py:25-92`).

Pre-processing (normalize/pad) and post-processing (resize + panoptic
argmax) live in ``pipeline.py`` / ``postprocess.py`` as pure jit-able
functions; this module is pure network.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .pixel_decoder import KMaXPixelDecoder
from .transformer_decoder import KMaXTransformerDecoder


class KMaXSegmenter(nn.Module):
    """backbone -> (optional WC module) -> pixel decoder -> transformer decoder."""

    backbone: nn.Module
    num_classes: int
    wc_module: Optional[nn.Module] = None
    pixel_dec_layers: Sequence[int] = (1, 5, 1, 1)
    pixel_dec_channels: Sequence[int] = (512, 256, 128, 64)
    pixel_dec_layer_types: Sequence[str] = ("axial", "axial", "bottleneck", "bottleneck")
    pixel_dec_in_features: Sequence[str] = ("res5", "res4", "res3", "res2")
    pixel_drop_path_prob: float = 0.0
    trans_dec_layers: Sequence[int] = (2, 2, 2)
    num_queries: int = 128
    trans_drop_path_prob: float = 0.0
    add_aux_semantic_pred: bool = False
    use_aux_semantic_decoder: bool = True
    spatial_shape: tuple = (1281, 1281)
    num_frames: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False, return_attn: bool = False):
        # images: (B*T, H, W, 3), already normalized & padded to spatial_shape.
        from ..parallel.sharding import constrain

        height_attn = width_attn = None
        images = constrain(images, "data", None, None, None)
        features = self.backbone(images, train=train)
        # dp over the clip-frame batch + tp over channels (GSPMD propagates
        # the channel partition into conv kernels / attention heads)
        features = {
            k: constrain(v, "data", None, None, "model") for k, v in features.items()
        }
        if self.wc_module is not None:
            features, height_attn, width_attn = self.wc_module(
                features, train=train, return_attn=return_attn
            )
            features = {
                k: constrain(v, "data", None, None, "model")
                for k, v in features.items()
            }
        pano, sem, ms = KMaXPixelDecoder(
            in_features=tuple(self.pixel_dec_in_features),
            dec_layers=tuple(self.pixel_dec_layers),
            dec_channels=tuple(self.pixel_dec_channels),
            layer_types=tuple(self.pixel_dec_layer_types),
            drop_path_prob=self.pixel_drop_path_prob,
            spatial_shape=tuple(self.spatial_shape),
            dtype=self.dtype,
            name="pixel_decoder",
        )(features, train=train)
        out = KMaXTransformerDecoder(
            num_classes=self.num_classes,
            dec_layers=tuple(self.trans_dec_layers),
            num_queries=self.num_queries,
            drop_path_prob=self.trans_drop_path_prob,
            add_aux_semantic_pred=self.add_aux_semantic_pred,
            use_aux_semantic_decoder=self.use_aux_semantic_decoder,
            num_frames=self.num_frames,
            dtype=self.dtype,
            name="transformer_decoder",
        )(ms, pano, sem, train=train)
        if return_attn:
            out["height_traj_attn"] = height_attn
            out["width_traj_attn"] = width_attn
        return out


def build_backbone(cfg, dtype=None):
    from .backbones.resnet import ResNet
    from .backbones.convnext import ConvNeXt

    name = cfg.model.backbone.name
    out_features = tuple(cfg.model.backbone.out_features)
    if name.startswith("resnet"):
        return ResNet(
            depth=cfg.model.backbone.resnet.depth,
            out_features=out_features,
            dtype=dtype,
            name="backbone",
        )
    if name.startswith("convnext"):
        c = cfg.model.backbone.convnext
        return ConvNeXt(
            depths=tuple(c.depths),
            dims=tuple(c.dims),
            drop_path_rate=c.drop_path_rate,
            layer_scale_init_value=c.layer_scale_init_value,
            use_grn=bool(c.use_grn),
            out_features=out_features,
            use_scan=bool(c.get("use_scan", False)),
            scan_unroll=int(c.get("scan_unroll", 3)),
            remat=bool(cfg.model.backbone.get("remat", False)),
            dtype=dtype,
            name="backbone",
        )
    if name.startswith("swin"):
        from .backbones.swin import SwinTransformer

        s = cfg.model.backbone.swin
        return SwinTransformer(
            embed_dim=s.embed_dim,
            depths=tuple(s.depths),
            num_heads=tuple(s.num_heads),
            window_size=s.window_size,
            mlp_ratio=s.mlp_ratio,
            qkv_bias=s.qkv_bias,
            drop_path_rate=s.drop_path_rate,
            patch_norm=s.patch_norm,
            out_features=out_features,
            dtype=dtype,
            name="backbone",
        )
    if name.startswith("stdc"):
        from .backbones.stdc import STDC_LAYERS, STDCNet

        return STDCNet(
            layers=STDC_LAYERS[name],
            out_features=out_features,
            dtype=dtype,
            name="backbone",
        )
    if name.startswith("vitae"):
        from .backbones.vitae_vsa import ViTAEv2VSA

        v = cfg.model.backbone.vitae
        return ViTAEv2VSA(
            embed_dims=tuple(v.embed_dims),
            token_dims=tuple(v.token_dims),
            nc_depths=tuple(v.nc_depths),
            nc_heads=tuple(v.nc_heads),
            nc_groups=tuple(v.nc_groups),
            rc_heads=tuple(v.rc_heads),
            window_size=v.window_size,
            mlp_ratio=v.mlp_ratio,
            wide_pcm=bool(v.wide_pcm),
            drop_path_rate=v.drop_path_rate,
            out_features=out_features,
            dtype=dtype,
            name="backbone",
        )
    raise ValueError(f"unknown backbone {name!r}")


def build_segmenter(cfg, num_frames: int | None = None, train: bool = False):
    """Build the (image or video) kMaX segmenter from a config tree."""
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else None
    backbone = build_backbone(cfg, dtype=dtype)

    wc_module = None
    if cfg.model.maxtron.wc.enable:
        from .wc_module import WithinClipTrackingModule

        w = cfg.model.maxtron.wc
        wc_module = WithinClipTrackingModule(
            conv_dims=w.conv_dims,
            nheads=w.nheads,
            dim_feedforward=w.dim_feedforward,
            num_stages=w.num_stages,
            spatial_layers=w.spatial_layers,
            temporal_layers=w.temporal_layers,
            temporal_attn_type=w.temporal_attn_type,
            spatial_in_features=tuple(w.spatial_in_features),
            temporal_in_features=tuple(w.temporal_in_features),
            enc_n_points=w.enc_n_points,
            dropout=w.dropout,
            attn_drop=w.attn_drop,
            num_frames=num_frames or cfg.input.num_clip_frames,
            dtype=dtype,
            name="wc_module",
        )

    kmax = cfg.model.kmax
    # in_features sorted low->high resolution (res5 first)
    in_features = tuple(sorted(kmax.pixel_dec.in_features, reverse=True))
    return KMaXSegmenter(
        backbone=backbone,
        wc_module=wc_module,
        num_classes=cfg.model.num_classes,
        pixel_dec_layers=tuple(kmax.pixel_dec.dec_layers),
        pixel_dec_channels=tuple(kmax.pixel_dec.dec_channels),
        pixel_dec_layer_types=tuple(kmax.pixel_dec.layer_types),
        pixel_dec_in_features=in_features,
        pixel_drop_path_prob=kmax.pixel_dec.drop_path_prob,
        trans_dec_layers=tuple(kmax.trans_dec.dec_layers),
        num_queries=kmax.trans_dec.num_object_queries,
        trans_drop_path_prob=kmax.trans_dec.drop_path_prob,
        add_aux_semantic_pred=(kmax.aux_semantic_weight > 0) and train,
        use_aux_semantic_decoder=kmax.use_aux_semantic_decoder,
        spatial_shape=tuple(cfg.input.image_size),
        num_frames=num_frames or 1,
        dtype=dtype,
    )

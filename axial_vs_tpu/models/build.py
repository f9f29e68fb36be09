"""Meta-architecture dispatch: config -> (model, criterion).

One registry covering both halves of the reference (d2 META_ARCH_REGISTRY +
mmdet DETECTORS): KMaXDeepLab / MaXTronWCDeepLab / MaXTronCCDeepLab /
TubeLinkVIS / TubeLinkVideoVIS / TubeLinkVPS.
"""
from __future__ import annotations

from ..utils.registry import Registry

META_ARCH_REGISTRY = Registry("meta_arch")


def criterion_from_config(cfg):
    from ..losses.criterion import SetCriterion

    kmax = cfg.model.kmax
    weights = {
        "loss_ce": kmax.class_weight,
        "loss_mask": kmax.mask_weight,
        "loss_dice": kmax.dice_weight,
        "loss_pixel_insdis": kmax.insdis_weight,
        "loss_aux_semantic": kmax.aux_semantic_weight,
    }
    return SetCriterion(
        num_classes=cfg.model.num_classes,
        weights=weights,
        eos_coef=kmax.no_object_weight,
        share_final_matching=kmax.share_final_matching,
        pixel_insdis_temperature=kmax.pixel_insdis_temperature,
        pixel_insdis_sample_k=kmax.pixel_insdis_sample_k,
        aux_semantic_temperature=kmax.aux_semantic_temperature,
        aux_semantic_sample_k=kmax.aux_semantic_sample_k,
        masking_void_pixel=kmax.masking_void_pixel,
    )


def build_model_and_criterion(cfg, train: bool = True):
    arch = cfg.model.meta_architecture
    builder = META_ARCH_REGISTRY.get(arch)
    return builder(cfg, train)


@META_ARCH_REGISTRY.register("KMaXDeepLab")
@META_ARCH_REGISTRY.register("MaXTronWCDeepLab")
def _build_kmax(cfg, train):
    from .kmax import build_segmenter

    num_frames = (
        cfg.input.num_video_frames
        if cfg.model.meta_architecture == "MaXTronWCDeepLab"
        else 1
    )
    model = build_segmenter(cfg, num_frames=num_frames, train=train)
    return model, criterion_from_config(cfg)


@META_ARCH_REGISTRY.register("MaXTronCCDeepLab")
def _build_maxtron_cc(cfg, train):
    from .kmax import build_segmenter
    from .maxtron_cc import MaXTronCCModel

    segmenter = build_segmenter(cfg, num_frames=cfg.input.num_clip_frames,
                                train=False)
    cc = cfg.model.maxtron.cc
    model = MaXTronCCModel(
        segmenter=segmenter,
        num_classes=cfg.model.num_classes,
        num_clip_frames=cfg.input.num_clip_frames,
        num_video_frames=cfg.input.num_video_frames,
        cc_num_layers=cc.num_layers,
        cc_kernel_sizes=tuple(cc.kernel_sizes),
        cc_atrous_rates=tuple(cc.atrous_rates),
        cc_attn_drop=cc.attn_drop,
        cc_aspp_drop=cc.aspp_drop,
        cc_norm_fn=cc.norm_fn,
        exact_matching=False,
    )
    criterion = criterion_from_config(cfg)
    criterion.losses = ("labels", "masks")  # CC supervises class+mask only
    return model, criterion


def _tube_criterion(cfg):
    from .tube_link.criterion import TubeLinkCriterion

    tl = cfg.model.tube_link
    crit = TubeLinkCriterion(
        num_things=cfg.model.num_classes,
        cls_weight=tl.cls_weight,
        mask_weight=tl.mask_weight,
        dice_weight=tl.dice_weight,
        bg_cls_weight=tl.bg_cls_weight,
        num_points=tl.num_points,
        exact_matching=False,
    )
    crit.weighted_total = crit.total  # unified trainer interface
    return crit


@META_ARCH_REGISTRY.register("TubeLinkVIS")
def _build_tube_link_vis(cfg, train):
    from .kmax import build_backbone
    from .tube_link.detector import TubeLinkVIS

    tl = cfg.model.tube_link
    model = TubeLinkVIS(
        backbone=build_backbone(cfg),
        num_things_classes=cfg.model.num_classes,
        num_queries=tl.num_queries,
        num_frames=cfg.input.num_clip_frames,
        use_temporal_attn=tl.use_temporal_attn,
        feat_channels=tl.feat_channels,
        out_channels=tl.out_channels,
        num_decoder_layers=tl.num_decoder_layers,
    )
    return model, _tube_criterion(cfg)


@META_ARCH_REGISTRY.register("TubeLinkVideoVIS")
def _build_tube_link_video_vis(cfg, train):
    from .kmax import build_backbone
    from .tube_link.cc_detector import TubeLinkVideoVIS

    tl = cfg.model.tube_link
    model = TubeLinkVideoVIS(
        backbone=build_backbone(cfg),
        num_things_classes=cfg.model.num_classes,
        num_queries=tl.num_queries,
        num_frames=cfg.input.num_clip_frames,
        num_cc_layers=cfg.model.maxtron.cc.num_layers,
        use_temporal_attn=tl.use_temporal_attn,
    )
    return model, _tube_criterion(cfg)


@META_ARCH_REGISTRY.register("TubeLinkVPS")
def _build_tube_link_vps(cfg, train):
    from .kmax import build_backbone
    from .tube_link.vps import TubeLinkVPS

    tl = cfg.model.tube_link
    # VPS configs set num_classes = things + stuff; split via model.num_things
    num_things = cfg.model.get("num_things") or cfg.model.num_classes
    model = TubeLinkVPS(
        backbone=build_backbone(cfg),
        num_things_classes=num_things,
        num_stuff_classes=cfg.model.num_classes - num_things,
        num_thing_queries=tl.num_queries,
        num_frames=cfg.input.num_clip_frames,
        use_temporal_attn=tl.use_temporal_attn,
    )
    return model, _tube_criterion(cfg)


@META_ARCH_REGISTRY.register("ImageMask2Former")
def _build_image_mask2former(cfg, train):
    """Tube-Link's COCO image-pretrain stage (T9; ref
    `MaXTron_Tube-Link/configs/image/mask2former/*.py`): Mask2Former =
    the tube head at num_frames=1. Panoptic leafs set model.num_things
    (things + stuff split); instance leafs leave it None (all things)."""
    from .kmax import build_backbone
    from .tube_link.image_mask2former import ImageMask2Former

    tl = cfg.model.tube_link
    num_things = cfg.model.get("num_things") or cfg.model.num_classes
    model = ImageMask2Former(
        backbone=build_backbone(cfg),
        num_things_classes=num_things,
        num_stuff_classes=cfg.model.num_classes - num_things,
        num_queries=tl.num_queries,
        use_temporal_attn=False,
    )
    return model, _tube_criterion(cfg)

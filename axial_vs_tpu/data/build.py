"""Mapper dispatch: cfg.input.dataset_mapper_name -> mapper instance
(replaces the reference's DATASET_MAPPER_NAME switch in its trainers).

``dataset_mapper_name: auto`` (the default) resolves from the meta-arch +
train dataset name, mirroring how the reference binds pipelines to dataset
types (mmdet datasets own their pipeline; d2 configs name their mapper):
tube-link archs take their own target formats regardless of dataset, and
kmax/maxtron archs pick panoptic/instance/vipseg mappers by dataset family.
"""
from __future__ import annotations


def resolve_mapper_name(cfg) -> str:
    name = cfg.input.dataset_mapper_name
    if name != "auto":
        return name
    arch = cfg.model.meta_architecture
    if arch in ("TubeLinkVIS", "TubeLinkVideoVIS"):
        return "ytvis"
    if arch == "TubeLinkVPS":
        return "dvps"
    train0 = cfg.datasets.train[0] if cfg.datasets.train else ""
    low = train0.lower()
    if low.startswith(("panovspw", "ov_vipseg", "vipseg")):
        return "vipseg_panoptic_mapper"
    if "instance" in low:
        return "coco_instance"
    return "coco_panoptic"


def build_mapper(cfg, seed: int = 0):
    name = resolve_mapper_name(cfg)
    common = dict(
        image_size=cfg.input.image_size,
        pixel_mean=cfg.input.pixel_mean,
        pixel_std=cfg.input.pixel_std,
        seed=seed,
    )
    if name in ("vipseg_panoptic_mapper", "vipseg"):
        from .catalog import MetadataCatalog
        from .vipseg import VIPSegClipMapper

        meta = MetadataCatalog.get(cfg.datasets.train[0]) if cfg.datasets.train else {}
        cat_map = dict(meta.get("thing_dataset_id_to_contiguous_id", {}))
        cat_map.update(meta.get("stuff_dataset_id_to_contiguous_id", {}))
        return VIPSegClipMapper(
            num_frames=cfg.input.num_video_frames,
            min_scale=cfg.input.min_scale,
            max_scale=cfg.input.max_scale,
            max_instances=cfg.model.kmax.trans_dec.num_object_queries,
            random_reverse=cfg.input.random_reverse,
            copy_paste=cfg.input.get("copy_paste", True),
            category_id_map=cat_map or None,
            **common,
        )
    if name in ("coco_panoptic_kmaxdeeplab", "coco_panoptic"):
        from .catalog import MetadataCatalog
        from .coco import CocoPanopticMapper

        meta = MetadataCatalog.get(cfg.datasets.train[0]) if cfg.datasets.train else {}
        return CocoPanopticMapper(
            min_scale=cfg.input.min_scale,
            max_scale=cfg.input.max_scale,
            max_instances=cfg.model.kmax.trans_dec.num_object_queries,
            thing_ids=list(meta.get("thing_dataset_id_to_contiguous_id", {})),
            copy_paste=cfg.input.get("copy_paste", True),
            **common,
        )
    if name in ("coco_instance_kmaxdeeplab", "coco_instance"):
        from .catalog import MetadataCatalog
        from .coco import CocoInstanceMapper

        meta = MetadataCatalog.get(cfg.datasets.train[0]) if cfg.datasets.train else {}
        return CocoInstanceMapper(
            min_scale=cfg.input.min_scale,
            max_scale=cfg.input.max_scale,
            max_instances=cfg.model.kmax.trans_dec.num_object_queries,
            dataset_id_to_contiguous_id=meta.get(
                "dataset_id_to_contiguous_id"),
            copy_paste=cfg.input.get("copy_paste", True),
            **common,
        )
    if name in ("ytvis", "ytvis_clip"):
        from .catalog import MetadataCatalog
        from .ytvis import YTVISClipMapper

        meta = MetadataCatalog.get(cfg.datasets.train[0]) if cfg.datasets.train else {}
        c2d = meta.get("contiguous_to_dataset_id")
        return YTVISClipMapper(
            num_frames=cfg.input.num_video_frames,
            max_instances=cfg.model.tube_link.num_queries,
            dataset_id_to_contiguous_id=(
                {d: c for c, d in enumerate(c2d)} if c2d else None),
            **common,
        )
    if name in ("dvps", "vipseg_dvps", "kitti_step", "vspw"):
        from .catalog import MetadataCatalog
        from .dvps import DVPSClipMapper

        meta = MetadataCatalog.get(cfg.datasets.train[0]) if cfg.datasets.train else {}
        return DVPSClipMapper(
            num_frames=cfg.input.num_video_frames,
            max_instances=cfg.model.tube_link.num_queries,
            thing_classes=meta.get("thing_classes", ()),
            ignore_label=meta.get("ignore_label", 255),
            **common,
        )
    raise ValueError(f"unknown dataset mapper {name!r}")

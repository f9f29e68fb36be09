"""Mapper dispatch: cfg.input.dataset_mapper_name -> mapper instance
(replaces the reference's DATASET_MAPPER_NAME switch in its trainers)."""
from __future__ import annotations


def build_mapper(cfg, seed: int = 0):
    name = cfg.input.dataset_mapper_name
    common = dict(
        image_size=cfg.input.image_size,
        pixel_mean=cfg.input.pixel_mean,
        pixel_std=cfg.input.pixel_std,
        seed=seed,
    )
    if name in ("vipseg_panoptic_mapper", "vipseg"):
        from .vipseg import VIPSegClipMapper

        return VIPSegClipMapper(
            num_frames=cfg.input.num_video_frames,
            min_scale=cfg.input.min_scale,
            max_scale=cfg.input.max_scale,
            max_instances=cfg.model.kmax.trans_dec.num_object_queries,
            random_reverse=cfg.input.random_reverse,
            copy_paste=cfg.input.get("copy_paste", True),
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
        from .ytvis import YTVISClipMapper

        return YTVISClipMapper(
            num_frames=cfg.input.num_video_frames,
            max_instances=cfg.model.tube_link.num_queries,
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

"""Open-vocabulary VIPSeg (OV-VIPSeg) dataset variant.

The reference's Tube-Link tree ships an OV-VIS benchmark built on VIPSeg's
58 THING classes split into base/novel sets
(`MaXTron_Tube-Link/datasets/datasets/ov_vis_vipseg.py`):
  - 33 base / 25 novel  (NOVEL_THING_CLASSES_25, :244-268)
  - 46 base / 12 novel  (NOVEL_THING_CLASSES_12, :281-293)
Training only supervises base classes; novel-class pixels are ignored and
clips containing novel segments are skipped; evaluation runs over all
things (`to_train_coco_base_33` :372-396, `to_coco` :350-369).

TPU-first differences from the reference:
  - the base-class category lists and the novel-clip skip indices are
    DERIVED from the novel-id sets and the annotations at registration time
    (the reference hardcodes ~1000-entry precomputed index lists that
    depend on dataset ordering; deriving them is order-independent).
  - label maps are plain dataset-id -> contiguous-id dicts consumed by the
    existing clip mappers, so the jit'd train step sees the same static
    (labels, masks, valid) layout as closed-vocabulary training.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Sequence

from .catalog import DatasetCatalog, MetadataCatalog
from .vipseg import load_vipseg_video_json, register_vipseg_video

# Novel THING category ids (VIPSeg panoptic category ids), per the
# reference's two OV splits (ov_vis_vipseg.py:244-268, :281-293).
NOVEL_THING_IDS_25 = (
    10, 43, 46, 47, 52, 54, 55, 56, 61, 63, 65, 79, 82, 83, 84, 92, 95,
    97, 99, 106, 107, 116, 117, 118, 123,
)
NOVEL_THING_IDS_12 = (50, 52, 56, 61, 65, 77, 79, 87, 89, 91, 114, 123)

OV_SPLITS = {
    "base33_novel25": NOVEL_THING_IDS_25,
    "base46_novel12": NOVEL_THING_IDS_12,
}


def split_thing_categories(categories: Dict[int, dict], novel_ids: Iterable[int]):
    """(base_things, novel_things), each sorted by category id. Base classes
    are all things NOT in the novel set — derived, not hardcoded."""
    novel = set(novel_ids)
    things = [c for c in categories.values() if c.get("isthing", 0)]
    things = sorted(things, key=lambda c: c["id"])
    base = [c for c in things if c["id"] not in novel]
    nov = [c for c in things if c["id"] in novel]
    return base, nov


def ov_label_maps(categories: Dict[int, dict], novel_ids: Iterable[int]):
    """Returns (train_map, eval_map): dataset category id -> contiguous id.

    train_map covers base things only (novel things and all stuff are
    absent -> the mapper drops those segments, matching the reference's
    NO_OBJ handling in to_train_coco_base_* :372-434). eval_map covers
    every thing class, base-first then novel (so base logits line up
    between train and eval checkpoints).
    """
    base, novel = split_thing_categories(categories, novel_ids)
    train_map = {c["id"]: i for i, c in enumerate(base)}
    eval_map = dict(train_map)
    for j, c in enumerate(novel):
        eval_map[c["id"]] = len(base) + j
    return train_map, eval_map


def video_has_novel(video: dict, novel_ids: Iterable[int]) -> bool:
    novel = set(novel_ids)
    for fr in video.get("frames", ()):
        for seg in fr.get("segments_info", ()):
            if seg.get("category_id") in novel:
                return True
    return False


def filter_novel_videos(videos: Sequence[dict], novel_ids: Iterable[int]) -> List[dict]:
    """Drop training videos containing any novel-class segment (the
    reference precomputes these as novel_clips_seq_index_* :270-348; we
    derive them from the annotations so ordering never matters)."""
    return [v for v in videos if not video_has_novel(v, novel_ids)]


def _thing_only_videos(videos: Sequence[dict], categories: Dict[int, dict],
                       keep_map: Dict[int, int]) -> List[dict]:
    """Restrict segments_info to categories present in keep_map (OV-VIS is
    thing-only: stuff segments are background, to_coco :350-369)."""
    out = []
    for v in videos:
        frames = []
        for fr in v["frames"]:
            segs = [s for s in fr.get("segments_info", ())
                    if s.get("category_id") in keep_map]
            frames.append({**fr, "segments_info": segs})
        out.append({**v, "frames": frames})
    return out


def register_ov_vipseg(root: str):
    """Register ov_vipseg_{train,val}_{base33_novel25,base46_novel12}.

    Uses the standard VIPSeg layout ($AXIALVS_DATASETS/VIPSeg). Train sets
    carry only base things and exclude novel-containing clips; val sets
    carry all things with base-first contiguous ids plus per-class
    base/novel flags for split VPQ/AP reporting.
    """
    base_dir = os.path.join(root, "VIPSeg")
    for split_name, novel_ids in OV_SPLITS.items():
        for phase in ("train", "val"):
            json_file = os.path.join(base_dir, f"panoVIPSeg_{phase}.json")
            if not os.path.exists(json_file):
                continue
            name = f"ov_vipseg_{phase}_{split_name}"
            if name in DatasetCatalog:
                continue
            image_root = os.path.join(base_dir, "imgs")
            pano_root = os.path.join(base_dir, "panomasks")

            def _load(json_file=json_file, novel_ids=novel_ids, phase=phase,
                      image_root=image_root, pano_root=pano_root):
                videos, cats = load_vipseg_video_json(json_file, image_root, pano_root)
                train_map, eval_map = ov_label_maps(cats, novel_ids)
                if phase == "train":
                    videos = filter_novel_videos(videos, novel_ids)
                    return _thing_only_videos(videos, cats, train_map)
                return _thing_only_videos(videos, cats, eval_map)

            DatasetCatalog.register(name, _load)
            meta = MetadataCatalog.get(name)
            meta.image_root = image_root
            meta.panoptic_root = pano_root
            meta.json_file = json_file
            with open(json_file) as f:
                cats = {c["id"]: c for c in json.load(f).get("categories", [])}
            train_map, eval_map = ov_label_maps(cats, novel_ids)
            base_cats, novel_cats = split_thing_categories(cats, novel_ids)
            meta.categories = cats
            meta.thing_dataset_id_to_contiguous_id = (
                train_map if phase == "train" else eval_map
            )
            meta.stuff_dataset_id_to_contiguous_id = {}
            active = train_map if phase == "train" else eval_map
            meta.contiguous_to_dataset_id = [
                did for did, _ in sorted(active.items(), key=lambda kv: kv[1])
            ]
            meta.thing_classes = [c["name"] for c in base_cats] + (
                [] if phase == "train" else [c["name"] for c in novel_cats]
            )
            meta.base_thing_ids = tuple(c["id"] for c in base_cats)
            meta.novel_thing_ids = tuple(novel_ids)
            meta.label_divisor = 10000
            meta.ignore_label = 255

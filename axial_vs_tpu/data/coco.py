"""COCO panoptic dataset (kMaX image pretrain) — registration + mapper.

Re-designs `kmax_deeplab/data/dataset_mappers/coco_panoptic_kmaxdeeplab_
dataset_mapper.py` + `register_coco_panoptic_annos_semseg.py` (V19): COCO
panoptic JSON -> per-image dicts; training mapper = ResizeScale + SSD color
jitter + RandomCrop + flip (same recipe as video, single frame), manual
bottom/right padding, RGB->id GT, optional copy-paste, targets padded to a
fixed slot count at 4x-downsampled resolution.
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from .catalog import DatasetCatalog, MetadataCatalog
from .panoptic_utils import rgb2id
from .transforms import build_train_transforms


def load_coco_panoptic_json(json_file, image_root, panoptic_root):
    with open(json_file) as f:
        data = json.load(f)
    images = {img["id"]: img for img in data["images"]}
    out = []
    for ann in data["annotations"]:
        img = images[ann["image_id"]]
        out.append(
            dict(
                image_id=ann["image_id"],
                file_name=os.path.join(image_root, img["file_name"]),
                pan_seg_file_name=os.path.join(panoptic_root, ann["file_name"]),
                segments_info=ann["segments_info"],
                height=img["height"],
                width=img["width"],
            )
        )
    return out, {c["id"]: c for c in data.get("categories", [])}


def register_coco_panoptic(name, image_root, panoptic_root, json_file):
    DatasetCatalog.register(
        name, lambda: load_coco_panoptic_json(json_file, image_root, panoptic_root)[0]
    )
    meta = MetadataCatalog.get(name)
    meta.image_root = image_root
    meta.panoptic_root = panoptic_root
    meta.json_file = json_file
    return meta


class CocoPanopticMapper:
    """image dict -> padded single-frame training sample (same target format
    as the video mapper with T=1)."""

    def __init__(self, *, image_size=(1281, 1281), min_scale=0.2, max_scale=2.0,
                 max_instances=128, pixel_mean=(123.675, 116.28, 103.53),
                 pixel_std=(58.395, 57.12, 57.375), thing_ids=None, seed=0):
        self.image_size = tuple(image_size)
        self.max_instances = max_instances
        self.pixel_mean = np.asarray(pixel_mean, np.float32)
        self.pixel_std = np.asarray(pixel_std, np.float32)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.thing_ids = set(thing_ids or [])
        self.rng = np.random.RandomState(seed)

    def __call__(self, record, dataset=None):
        tfm = build_train_transforms(self.image_size, self.min_scale, self.max_scale)
        img = np.asarray(Image.open(record["file_name"]).convert("RGB"))
        tfm.sample(self.rng, img.shape[:2])
        img = tfm.apply_image(img)
        pan = tfm.apply_segmentation(
            rgb2id(np.asarray(Image.open(record["pan_seg_file_name"]).convert("RGB")))
        )
        th, tw = self.image_size
        h, w = img.shape[:2]
        x = np.zeros((th, tw, 3), np.float32)
        x[: min(h, th), : min(w, tw)] = (
            (img[:th, :tw].astype(np.float32) - self.pixel_mean) / self.pixel_std
        )
        pad_pan = np.full((th, tw), -1, np.int64)
        pad_pan[: min(h, th), : min(w, tw)] = pan[:th, :tw]

        pan4 = pad_pan[::4, ::4]
        h4, w4 = pan4.shape
        m = self.max_instances
        labels = np.zeros((m,), np.int32)
        masks = np.zeros((m, h4, w4), np.float32)
        valid = np.zeros((m,), bool)
        semantic = np.full((h4, w4), -1, np.int64)
        slot = 0
        for seg in record["segments_info"]:
            if seg.get("iscrowd", 0):
                continue
            binary = pan4 == seg["id"]
            if not binary.any() or slot >= m:
                continue
            semantic[binary] = seg["category_id"]
            labels[slot] = seg["category_id"]
            masks[slot] = binary
            valid[slot] = True
            slot += 1
        return dict(
            images=x,
            targets=dict(
                labels=labels, masks=masks, valid=valid,
                semantic_masks=semantic.astype(np.int32),
            ),
        )

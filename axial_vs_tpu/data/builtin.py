"""Builtin dataset registration (side-effect import).

Mirrors `maxtron_deeplab/data/datasets/register_panovspw_vps_video.py:9-80`
and the COCO registrations: datasets are looked up under $AXIALVS_DATASETS
(default ./datasets) and registered only if present on disk.

Expected layout:
  $AXIALVS_DATASETS/VIPSeg/
      imgs/<video_id>/*.jpg
      panomasks/<video_id>/*.png
      panoVIPSeg_{train,val}.json
  $AXIALVS_DATASETS/coco/...
"""
from __future__ import annotations

import json
import os

from .catalog import DatasetCatalog, MetadataCatalog
from .vipseg import register_vipseg_video

_ROOT = os.environ.get("AXIALVS_DATASETS", "datasets")


def _register_vipseg_all(root: str):
    base = os.path.join(root, "VIPSeg")
    for split in ("train", "val"):
        json_file = os.path.join(base, f"panoVIPSeg_{split}.json")
        if not os.path.exists(json_file):
            continue
        name = f"panoVSPW_vps_video_{split}"
        if name in DatasetCatalog:
            continue
        meta = register_vipseg_video(
            name,
            image_root=os.path.join(base, "imgs"),
            panoptic_root=os.path.join(base, "panomasks"),
            json_file=json_file,
        )
        with open(json_file) as f:
            cats = json.load(f).get("categories", [])
        cats = sorted(cats, key=lambda c: c["id"])
        meta.categories = {c["id"]: c for c in cats}
        meta.thing_dataset_id_to_contiguous_id = {}
        meta.stuff_dataset_id_to_contiguous_id = {}
        meta.contiguous_to_dataset_id = []
        for i, c in enumerate(cats):
            meta.contiguous_to_dataset_id.append(c["id"])
            if c.get("isthing", 0):
                meta.thing_dataset_id_to_contiguous_id[c["id"]] = i
            else:
                meta.stuff_dataset_id_to_contiguous_id[c["id"]] = i
        meta.label_divisor = 10000
        meta.ignore_label = 255


_register_vipseg_all(_ROOT)

from .ov_vipseg import register_ov_vipseg  # noqa: E402

register_ov_vipseg(_ROOT)

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


def _register_coco_all(root: str):
    """COCO 2017 panoptic + instance (ref `register_coco_panoptic_annos_
    semseg.py`, `instance_kmaxdeeplab_dataset_mapper.py`). Gated on disk
    presence, like VIPSeg."""
    from .coco import register_coco_instance, register_coco_panoptic

    base = os.path.join(root, "coco")
    ann = os.path.join(base, "annotations")
    for split in ("train2017", "val2017"):
        short = split[:-4]
        pj = os.path.join(ann, f"panoptic_{split}.json")
        name = f"coco_2017_{short}_panoptic"
        if os.path.exists(pj) and name not in DatasetCatalog:
            register_coco_panoptic(
                name,
                image_root=os.path.join(base, split),
                panoptic_root=os.path.join(ann, f"panoptic_{split}"),
                json_file=pj,
            )
        ij = os.path.join(ann, f"instances_{split}.json")
        name = f"coco_2017_{short}_instance"
        if os.path.exists(ij) and name not in DatasetCatalog:
            register_coco_instance(
                name, image_root=os.path.join(base, split), json_file=ij)


def _register_ade20k_all(root: str):
    """ADE20k panoptic + instance (ref `register_ade20k_panoptic.py`,
    `register_ade20k_instance.py`); both use COCO-format JSONs, categories
    read from the JSON itself."""
    from .coco import register_coco_instance, register_coco_panoptic

    base = os.path.join(root, "ADEChallengeData2016")
    for split in ("train", "val"):
        pj = os.path.join(base, f"ade20k_panoptic_{split}.json")
        name = f"ade20k_panoptic_{split}"
        if os.path.exists(pj) and name not in DatasetCatalog:
            register_coco_panoptic(
                name,
                image_root=os.path.join(base, f"images/{split}ing"
                                        if split == "train" else "images/validation"),
                panoptic_root=os.path.join(base, f"ade20k_panoptic_{split}"),
                json_file=pj,
            )
        ij = os.path.join(
            base, f"ade20k_instance_{split}.json")
        name = f"ade20k_instance_{split}"
        if os.path.exists(ij) and name not in DatasetCatalog:
            register_coco_instance(
                name,
                image_root=os.path.join(base, "images/training"
                                        if split == "train" else "images/validation"),
                json_file=ij,
            )


def _register_cityscapes_all(root: str):
    """Cityscapes fine panoptic (ref configs `cityscapes_fine_panoptic_*`;
    the panoptic JSON is COCO-format, produced by cityscapesscripts'
    createPanopticImgs.py)."""
    from .coco import register_coco_panoptic

    base = os.path.join(root, "cityscapes")
    for split in ("train", "val"):
        pj = os.path.join(base, "gtFine",
                          f"cityscapes_panoptic_{split}.json")
        name = f"cityscapes_fine_panoptic_{split}"
        if os.path.exists(pj) and name not in DatasetCatalog:
            register_coco_panoptic(
                name,
                image_root=os.path.join(base, "leftImg8bit", split),
                panoptic_root=os.path.join(
                    base, "gtFine", f"cityscapes_panoptic_{split}"),
                json_file=pj,
            )


_register_vipseg_all(_ROOT)
_register_coco_all(_ROOT)
_register_ade20k_all(_ROOT)
_register_cityscapes_all(_ROOT)

from .ov_vipseg import register_ov_vipseg  # noqa: E402

register_ov_vipseg(_ROOT)

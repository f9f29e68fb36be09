#!/usr/bin/env python
"""COCO instance annotations -> single-frame YTVIS-format json (T17,
mirrors `MaXTron_Tube-Link/scripts/coco2ytvis.py`): wraps each image as a
1-frame video so COCO can pretrain / joint-train VIS models."""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coco-json", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--category-map", default=None,
                    help="optional json {coco_cat_id: ytvis_cat_id}")
    args = ap.parse_args()

    with open(args.coco_json) as f:
        coco = json.load(f)
    cat_map = None
    if args.category_map:
        with open(args.category_map) as f:
            cat_map = {int(k): v for k, v in json.load(f).items()}

    videos, annotations = [], []
    for img in coco["images"]:
        videos.append(
            dict(id=img["id"], file_names=[img["file_name"]],
                 height=img["height"], width=img["width"], length=1)
        )
    for ann in coco["annotations"]:
        cat = ann["category_id"]
        if cat_map is not None:
            if cat not in cat_map:
                continue
            cat = cat_map[cat]
        annotations.append(
            dict(id=ann["id"], video_id=ann["image_id"], category_id=cat,
                 segmentations=[ann.get("segmentation")],
                 areas=[ann.get("area")], iscrowd=ann.get("iscrowd", 0))
        )
    cats = coco["categories"]
    if cat_map is not None:
        cats = [dict(c, id=cat_map[c["id"]]) for c in cats if c["id"] in cat_map]
    with open(args.output, "w") as f:
        json.dump(dict(videos=videos, annotations=annotations, categories=cats), f)
    print(f"wrote {args.output}: {len(videos)} videos, {len(annotations)} annotations")


if __name__ == "__main__":
    main()

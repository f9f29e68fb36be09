"""Flatten YouTube-VIS / OVIS annotations into COCO-Video style.

Mirrors `MaXTron_Tube-Link/tools/dataset/youtubevis2coco.py`: per-video
records become per-frame ``images`` entries (with ``video_id`` /
``frame_id``) and per-track annotations become per-frame ``annotations``
entries carrying a global ``instance_id``, so image-style COCO tooling can
consume video datasets.

Usage:
  python tools/dataset/ytvis2coco.py -i ytvis_2021/train/instances.json \
      -o ytvis_2021_train_coco.json
"""
from __future__ import annotations

import argparse
import json


def convert(src: dict) -> dict:
    out = {
        "categories": src.get("categories", []),
        "videos": [],
        "images": [],
        "annotations": [],
    }
    img_id = 1
    ann_id = 1
    instance_id = 1
    anns_by_video = {}
    for ann in src.get("annotations", []):
        anns_by_video.setdefault(ann["video_id"], []).append(ann)

    for video in src.get("videos", []):
        name = video["file_names"][0].split("/")[0]
        out["videos"].append({"id": video["id"], "name": name})
        track_instance = {}
        frame_image_ids = []
        for frame_id, file_name in enumerate(video["file_names"]):
            out["images"].append(
                dict(
                    id=img_id,
                    file_name=file_name,
                    height=video["height"],
                    width=video["width"],
                    video_id=video["id"],
                    frame_id=frame_id,
                )
            )
            frame_image_ids.append(img_id)
            img_id += 1
        for ann in anns_by_video.get(video["id"], []):
            if ann["id"] not in track_instance:
                track_instance[ann["id"]] = instance_id
                instance_id += 1
            for frame_id, seg in enumerate(ann.get("segmentations", [])):
                if seg is None:
                    continue
                bbox = (ann.get("bboxes") or [None] * (frame_id + 1))[frame_id]
                area = (ann.get("areas") or [None] * (frame_id + 1))[frame_id]
                out["annotations"].append(
                    dict(
                        id=ann_id,
                        image_id=frame_image_ids[frame_id],
                        video_id=video["id"],
                        frame_id=frame_id,
                        instance_id=track_instance[ann["id"]],
                        category_id=ann["category_id"],
                        segmentation=seg,
                        bbox=bbox,
                        area=area,
                        iscrowd=ann.get("iscrowd", 0),
                    )
                )
                ann_id += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    args = ap.parse_args()
    with open(args.input) as f:
        src = json.load(f)
    out = convert(src)
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(
        f"wrote {args.output}: {len(out['videos'])} videos, "
        f"{len(out['images'])} images, {len(out['annotations'])} annotations"
    )


if __name__ == "__main__":
    main()

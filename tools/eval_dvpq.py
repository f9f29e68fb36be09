#!/usr/bin/env python
"""Offline VPQ from dumped panomask PNGs + JSONs (V22,
`MaXTron_Video-kMaX/tools/eval_dvpq_vipseg.py` equivalent).

Expects the layout the VIPSegEvaluator writes (and the reference's format):
  <pred_dir>/<video_id>/*.png + pred.json
  <gt_dir>/<video_id>/*.png   + gt json with segments_info per frame.

Usage:
  python tools/eval_dvpq.py --gt-json panoVIPSeg_val.json \
      --gt-panomasks panomasks/ --pred-dir output/pan_pred [--windows 1 2 4 6]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The sandbox's sitecustomize imports jax at interpreter startup, so
# JAX_PLATFORMS in the environment is read too early — honor it here
# (same trick as tools/train_net_video.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


from axial_vs_tpu.data.panoptic_utils import rgb2id  # noqa: E402
from axial_vs_tpu.evaluation.vpq import vpq_compute  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--gt-panomasks", required=True)
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--windows", nargs="+", type=int, default=[1, 2, 4, 6])
    ap.add_argument("--num-workers", type=int, default=8)
    args = ap.parse_args()

    with open(args.gt_json) as f:
        gt_data = json.load(f)
    categories = {
        c["id"]: {"isthing": c.get("isthing", 0)} for c in gt_data["categories"]
    }

    videos = []
    for vid in gt_data["videos"]:
        video_id = vid["video_id"]
        pred_json_path = os.path.join(args.pred_dir, video_id, "pred.json")
        if not os.path.exists(pred_json_path):
            continue
        with open(pred_json_path) as f:
            pred_meta = json.load(f)

        gt_frames, gt_segments = [], {}
        anns = {a["image_id"]: a for a in vid.get("annotations", [])}
        pred_frames, pred_segments = [], {}
        pred_by_name = {a["file_name"]: a for a in pred_meta["annotations"]}
        for img in vid["images"]:
            ann = anns.get(img["id"])
            if ann is None:
                continue
            gt_pan = rgb2id(np.asarray(Image.open(
                os.path.join(args.gt_panomasks, video_id, ann["file_name"])
            ).convert("RGB")))
            gt_frames.append(gt_pan)
            for seg in ann["segments_info"]:
                gt_segments[seg["id"]] = {
                    "category_id": seg["category_id"],
                    "iscrowd": seg.get("iscrowd", 0),
                }
            pred_name = os.path.basename(ann["file_name"])
            pred_png = os.path.join(args.pred_dir, video_id, pred_name)
            pred_pan = rgb2id(np.asarray(Image.open(pred_png).convert("RGB")))
            pred_frames.append(pred_pan)
            for seg in pred_by_name.get(pred_name, {}).get("segments_info", []):
                pred_segments[seg["id"]] = {"category_id": seg["category_id"]}
        if gt_frames:
            videos.append((
                np.stack(gt_frames), np.stack(pred_frames),
                gt_segments, pred_segments,
            ))

    res = vpq_compute(videos, categories, window_sizes=tuple(args.windows),
                      num_workers=args.num_workers)
    for k, stats in sorted(res["per_window"].items()):
        print(f"VPQ@{k}: all={stats['all']['pq']:.4f} "
              f"things={stats['things']['pq']:.4f} stuff={stats['stuff']['pq']:.4f}")
    print(f"VPQ (mean over {args.windows}): {res['vpq']:.4f}")


if __name__ == "__main__":
    main()

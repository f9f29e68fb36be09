"""VSPW semantic mIoU CLI.

Counterpart of `MaXTron_Tube-Link/scripts/test_vspw/iou_cal.py`: accumulates
a confusion matrix over all frames of all val videos and reports the
reference-exact mIoU (classes averaged only when present in GT).

Usage: python tools/eval_vspw_iou.py --gtdir data/VSPW --preddir work_dirs/run
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The sandbox's sitecustomize imports jax at interpreter startup, so
# JAX_PLATFORMS in the environment is read too early — honor it here
# (same trick as tools/train_net_video.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import numpy as np
from PIL import Image

from axial_vs_tpu.evaluation.vspw_metrics import SemanticIoU


def rescale_nearest(arr: np.ndarray, short_side: int) -> np.ndarray:
    """mmcv.imrescale(scale=(res, 100000), nearest) semantics: scale the
    short side to `short_side`, preserving aspect ratio."""
    h, w = arr.shape
    factor = min(short_side / min(h, w), 100000 / max(h, w))
    size = (int(w * factor + 0.5), int(h * factor + 0.5))
    return np.asarray(Image.fromarray(arr).resize(size, Image.NEAREST))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gtdir", required=True)
    ap.add_argument("--preddir", required=True)
    ap.add_argument("--split", default="val.txt")
    ap.add_argument("--num-classes", type=int, default=124)
    ap.add_argument("--eval-res", type=int, default=-1)
    args = ap.parse_args()

    with open(os.path.join(args.gtdir, args.split)) as f:
        videos = [v.strip() for v in f if v.strip() and not v.startswith(".")]
    preddir = os.path.join(args.preddir, "pred")

    metric = SemanticIoU(args.num_classes, ignore_label=255)
    for video in videos:
        maskdir = os.path.join(args.gtdir, "data", video, "mask")
        for name in sorted(os.listdir(maskdir)):
            if name.startswith("."):
                continue
            gt = np.asarray(Image.open(os.path.join(maskdir, name)))
            pred = np.asarray(Image.open(os.path.join(preddir, video, name)))
            if args.eval_res > 0:
                gt = rescale_nearest(gt, args.eval_res)
            metric.update(gt, pred)
    print(f"mIoU: {metric.miou():.6f} on {args.split} set")


if __name__ == "__main__":
    main()

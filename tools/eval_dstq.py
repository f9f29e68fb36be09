#!/usr/bin/env python
"""Offline STQ/DSTQ from dumped panoptic id PNGs (V22,
`MaXTron_Video-kMaX/tools/eval_dstq_vipseg.py` equivalent).

Panoptic maps are read in the DVPS channel encoding (R = semantic class,
G + 256*B = instance id); optional depth PNGs (uint16 mm) enable DSTQ.

Usage:
  python tools/eval_dstq.py --gt-dir gt_dvps/ --pred-dir pred_dvps/ \
      --num-classes 124 --things 0 1 2 ... [--depth-gt-dir d/ --depth-pred-dir d2/]
"""
import argparse
import glob
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


from axial_vs_tpu.evaluation.dstq import DSTQuality  # noqa: E402
from axial_vs_tpu.evaluation.stq import STQuality  # noqa: E402


def encode(png, shift):
    sem = png[..., 0].astype(np.int64)
    inst = png[..., 1].astype(np.int64) + 256 * png[..., 2].astype(np.int64)
    return (sem << shift) + inst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--things", nargs="+", type=int, required=True)
    ap.add_argument("--ignore-label", type=int, default=255)
    ap.add_argument("--depth-gt-dir", default=None)
    ap.add_argument("--depth-pred-dir", default=None)
    args = ap.parse_args()

    shift = 16
    use_depth = args.depth_gt_dir is not None
    metric = (
        DSTQuality(args.num_classes, args.things, args.ignore_label, shift)
        if use_depth
        else STQuality(args.num_classes, args.things, args.ignore_label, shift)
    )

    for seq_dir in sorted(glob.glob(os.path.join(args.gt_dir, "*"))):
        if not os.path.isdir(seq_dir):
            continue
        seq = os.path.basename(seq_dir)
        for gt_path in sorted(glob.glob(os.path.join(seq_dir, "*.png"))):
            name = os.path.basename(gt_path)
            pred_path = os.path.join(args.pred_dir, seq, name)
            if not os.path.exists(pred_path):
                continue
            gt = encode(np.asarray(Image.open(gt_path).convert("RGB")), shift)
            pred = encode(np.asarray(Image.open(pred_path).convert("RGB")), shift)
            if use_depth:
                d_gt = np.asarray(
                    Image.open(os.path.join(args.depth_gt_dir, seq, name))
                ).astype(np.float64)
                d_pred = np.asarray(
                    Image.open(os.path.join(args.depth_pred_dir, seq, name))
                ).astype(np.float64)
                metric.update_state(gt, pred, d_gt, d_pred, sequence_id=seq)
            else:
                metric.update_state(gt, pred, sequence_id=seq)

    res = metric.result()
    keys = ["STQ", "AQ", "IoU"] + (["DSTQ", "DQ"] if use_depth else [])
    for k in keys:
        print(f"{k}: {res[k]:.4f}")


if __name__ == "__main__":
    main()

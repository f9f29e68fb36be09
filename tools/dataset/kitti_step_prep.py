"""Prepare KITTI-STEP into the DVPS ``video_sequence`` layout.

Mirrors the reference's `MaXTron_Tube-Link/tools/dataset/
kitti_step_prepare.py:1-56` (same official train/val sequence split and
`{seq:06d}_{frame}_leftImg8bit.png` / `_panoptic.png` naming) as a proper
CLI: paths are arguments, files are copied by default (pass ``--move`` to
reproduce the reference's destructive move).

Usage:
  python tools/dataset/kitti_step_prep.py \
      --train-root KITTI-STEP/training --test-root KITTI-STEP/testing \
      --out KITTI-STEP/kitti_out
"""
from __future__ import annotations

import argparse
import os
import shutil

TRAIN_SEQS = (0, 1, 3, 4, 5, 9, 11, 12, 15, 17, 19, 20)
VAL_SEQS = (2, 6, 7, 8, 10, 13, 14, 16, 18)
TEST_SEQS = tuple(range(29))


def collect(seq_id: int, input_dir: str, output_dir: str, suffix: str,
            move: bool = False):
    src_dir = os.path.join(input_dir, f"{seq_id:04d}")
    if not os.path.isdir(src_dir):
        print(f"skip seq {seq_id}: {src_dir} missing")
        return 0
    os.makedirs(output_dir, exist_ok=True)
    op = shutil.move if move else shutil.copy2
    n = 0
    for fname in sorted(os.listdir(src_dir)):
        stem = fname.split(".")[0]
        dst = os.path.join(output_dir, f"{seq_id:06d}_{stem}_{suffix}.png")
        op(os.path.join(src_dir, fname), dst)
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-root", required=True,
                    help="KITTI-STEP/training (contains image_02/, panoptic/)")
    ap.add_argument("--test-root", default=None,
                    help="KITTI-STEP/testing (contains image_02/)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--move", action="store_true",
                    help="move files instead of copying")
    args = ap.parse_args()

    for split, seqs in (("train", TRAIN_SEQS), ("val", VAL_SEQS)):
        out = os.path.join(args.out, "video_sequence", split)
        total = 0
        for seq in seqs:
            total += collect(seq, os.path.join(args.train_root, "panoptic"),
                             out, "panoptic", args.move)
            total += collect(seq, os.path.join(args.train_root, "image_02"),
                             out, "leftImg8bit", args.move)
        print(f"{split}: {total} files")
    if args.test_root:
        out = os.path.join(args.out, "video_sequence", "test")
        total = sum(
            collect(seq, os.path.join(args.test_root, "image_02"), out,
                    "leftImg8bit", args.move)
            for seq in TEST_SEQS
        )
        print(f"test: {total} files")


if __name__ == "__main__":
    main()

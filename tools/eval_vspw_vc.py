"""VSPW video-consistency (VC) metric CLI.

Counterpart of `MaXTron_Tube-Link/scripts/test_vspw/VC_perclip.py`: for each
video, sliding windows of --clip-num frames; VC = nanmean over all windows
of the fraction of the GT-static area where predictions are also static.

Usage: python tools/eval_vspw_vc.py --gtdir data/VSPW --preddir work_dirs/run
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

from axial_vs_tpu.evaluation.vspw_metrics import video_consistency


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gtdir", required=True)
    ap.add_argument("--preddir", required=True)
    ap.add_argument("--split", default="val.txt")
    ap.add_argument("--clip-num", type=int, default=16)
    args = ap.parse_args()

    with open(os.path.join(args.gtdir, args.split)) as f:
        videos = [v.strip() for v in f if v.strip() and not v.startswith(".")]
    preddir = os.path.join(args.preddir, "pred")

    total = []
    for video in videos:
        maskdir = os.path.join(args.gtdir, "data", video, "mask")
        names = sorted(n for n in os.listdir(maskdir) if not n.startswith("."))
        if len(names) <= args.clip_num:
            continue
        gts = np.stack([np.asarray(Image.open(os.path.join(maskdir, n)))
                        for n in names])
        preds = np.stack([np.asarray(Image.open(os.path.join(preddir, video, n)))
                          for n in names])
        accs = video_consistency(gts, preds, window=args.clip_num)
        print(f"{video}: {np.nanmean(accs):.4f}", flush=True)
        total.extend(accs)

    print(f"VC{args.clip_num} score: {np.nanmean(np.asarray(total)):.6f} "
          f"on {args.split} set")


if __name__ == "__main__":
    main()

"""VSPW temporal-consistency (TC) metric CLI — flow-warped mIoU.

TPU-native counterpart of the reference's analysis script
(`MaXTron_Tube-Link/scripts/test_vspw/TC_cal.py`): runs RAFT (models/raft.py,
jitted, one compile per padded shape) over consecutive frame pairs, warps
each next-frame prediction back with the forward flow (reference-exact
nearest warp) and accumulates IoU(pred_t, warped) over all pairs.

Usage:
  python tools/eval_vspw_tc.py --gtdir data/VSPW --preddir work_dirs/run \
      --raft-weights raft-things.pth [--iters 20] [--num-classes 124]

The RAFT weights are the released torch checkpoint (any 'module.'-prefixed
DataParallel dict is handled); conversion happens in-process via
utils/torch_convert.convert_raft.
"""
from __future__ import annotations

import argparse
import functools
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

import jax
import jax.numpy as jnp
from PIL import Image

from axial_vs_tpu.evaluation.vspw_metrics import SemanticIoU, update_tc_pairs
from axial_vs_tpu.models.raft import RAFT
from axial_vs_tpu.utils.torch_convert import convert_raft


def load_raft_params(path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {(k[7:] if k.startswith("module.") else k): v.numpy()
          for k, v in sd.items()}
    return convert_raft(sd)


def pad8(img: np.ndarray):
    """Pad H/W up to multiples of 8 (InputPadder 'sintel' split)."""
    h, w = img.shape[:2]
    ph = (((h // 8) + 1) * 8 - h) % 8
    pw = (((w // 8) + 1) * 8 - w) % 8
    pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    return np.pad(img, pads), (pads[0][0], pads[1][0], h, w)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gtdir", required=True,
                    help="VSPW root containing val.txt and data/<video>/origin")
    ap.add_argument("--preddir", required=True,
                    help="directory containing pred/<video>/<frame>.png")
    ap.add_argument("--raft-weights", required=True)
    ap.add_argument("--split", default="val.txt")
    ap.add_argument("--num-classes", type=int, default=124)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-videos", type=int, default=0)
    args = ap.parse_args()

    params, stats = load_raft_params(args.raft_weights)
    model = RAFT(iters=args.iters)

    @functools.partial(jax.jit)
    def flow_fn(im1, im2):
        return model.apply({"params": params, "batch_stats": stats},
                           im1, im2, train=False)

    with open(os.path.join(args.gtdir, args.split)) as f:
        videos = [v.strip() for v in f if v.strip() and not v.startswith(".")]
    if args.max_videos:
        videos = videos[: args.max_videos]

    datadir = os.path.join(args.gtdir, "data")
    preddir = os.path.join(args.preddir, "pred")
    metric = SemanticIoU(args.num_classes, ignore_label=255)

    for video in videos:
        frames = sorted(
            f for f in os.listdir(os.path.join(datadir, video, "origin"))
            if not f.startswith("."))
        if len(frames) < 2:
            # no frame pairs → no flow; the reference iterates
            # imglist_[:-1] and likewise skips such videos
            print(f"{video}: <2 frames, skipped", flush=True)
            continue
        preds, flows = [], []
        prev = None
        for i, name in enumerate(frames):
            img = np.asarray(Image.open(
                os.path.join(datadir, video, "origin", name)), np.float32)
            pred = np.asarray(Image.open(os.path.join(
                preddir, video, os.path.splitext(name)[0] + ".png")))
            preds.append(pred)
            if prev is not None:
                p1, (pt, plft, h, w) = pad8(prev)
                p2, _ = pad8(img)
                fl = np.asarray(flow_fn(jnp.asarray(p1)[None],
                                        jnp.asarray(p2)[None]))[0]
                flows.append(fl[pt:pt + h, plft:plft + w])
            prev = img
        update_tc_pairs(metric, np.stack(preds), np.stack(flows))
        print(f"{video}: running TC {metric.miou():.4f}", flush=True)

    print(f"TC score is {metric.miou():.6f}")


if __name__ == "__main__":
    main()

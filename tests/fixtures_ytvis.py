"""Synthetic on-disk YTVIS-format fixture (frames + train.json with RLEs).

Used by the Tube-Link VIS overfit validation tool
(tools/validate_overfit_vis.py) and its regression test: a tiny but REAL
YouTube-VIS dataset — video frame files, per-frame RLE tube annotations,
categories — exercising the exact on-disk format `data/ytvis.py` parses
(the reference's YTVIS json layout,
`MaXTron_Tube-Link/datasets/datasets/core/ytvis.py`).

Geometry is deliberately 4-ALIGNED (positions/sizes multiples of 4, motion
in 4 px steps) so the OS4 mask grid can represent every instance exactly —
the overfit target is YTVIS AP >= 0.9, which averages IoU thresholds up to
0.95 and would otherwise be capped by irreducible boundary error.
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def synthesize_ytvis_videos(root: str, n_videos: int = 2, n_frames: int = 8,
                            hw=(96, 160), seed: int = 0):
    """Writes (if absent) frames + train.json; returns (image_root,
    json_path). Two thing instances per video: a moving box (category 1)
    and a static box (category 2), distinct colors on a textured
    background."""
    h, w = hw
    root = os.path.join(root, f"ytvis_{h}x{w}")
    img_root = os.path.join(root, "frames")
    json_path = os.path.join(root, "train.json")
    rng = np.random.RandomState(seed)

    videos, annotations = [], []
    ann_id = 1
    for v in range(n_videos):
        vdir = os.path.join(img_root, f"v{v}")
        os.makedirs(vdir, exist_ok=True)
        base = rng.randint(20, 90, (h, w, 3)).astype(np.uint8)
        files = []
        masks1, masks2 = [], []
        for f in range(n_frames):
            rel = f"v{v}/{f:03d}.png"
            p = os.path.join(img_root, rel)
            files.append(rel)
            img = base.copy()
            m1 = np.zeros((h, w), np.uint8)
            m2 = np.zeros((h, w), np.uint8)
            # moving box, 4 px/frame, positions 4-aligned
            x0 = 8 + 4 * f + 8 * v
            y0 = 12 + 4 * v
            img[y0:y0 + 32, x0:x0 + 40] = [210, 60, 50]
            m1[y0:y0 + 32, x0:x0 + 40] = 1
            # static box (does not overlap the moving one's track)
            sx, sy = 112, 56
            img[sy:sy + 28, sx:sx + 36] = [50, 200, 90]
            m2[sy:sy + 28, sx:sx + 36] = 1
            if not os.path.exists(p):
                Image.fromarray(img).save(p)
            masks1.append(m1)
            masks2.append(m2)
        videos.append(dict(id=v + 1, file_names=files, height=h, width=w,
                           length=n_frames))
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from axial_vs_tpu.data import mask_rle

        for cat, masks in ((1, masks1), (2, masks2)):
            annotations.append(dict(
                id=ann_id, video_id=v + 1, category_id=cat,
                segmentations=[mask_rle.encode(m) for m in masks],
                areas=[int(m.sum()) for m in masks], iscrowd=0,
            ))
            ann_id += 1

    if not os.path.exists(json_path):
        with open(json_path, "w") as fh:
            json.dump(dict(
                videos=videos, annotations=annotations,
                categories=[dict(id=1, name="mover"),
                            dict(id=2, name="sitter")],
            ), fh)
    return img_root, json_path

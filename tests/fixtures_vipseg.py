"""Synthetic on-disk VIPSeg-format fixture (jpegs + panoptic pngs).

Used by the loader-in-the-loop training bench (tools/bench_train.py
--with-loader) and the overfit validation tool: real image decode and
augmentation cost on realistic frame sizes without any dataset download.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image


def synthesize_vipseg_videos(root: str, n_videos: int = 4, n_frames: int = 6,
                             hw=(720, 1280), seed: int = 0,
                             thing_class: int = 3, stuff_class: int = 5):
    """Writes (if absent) and returns VIPSeg-style video dicts: a moving
    thing box (id 1, class 3) over a stuff background (id 2, class 5) plus
    a second static thing (id 4, class 3)."""
    rng = np.random.RandomState(seed)
    h, w = hw
    root = os.path.join(root, f"{h}x{w}")  # size-keyed: no cross-run reuse
    videos = []
    for v in range(n_videos):
        vdir = os.path.join(root, f"video{v}")
        os.makedirs(os.path.join(vdir, "img"), exist_ok=True)
        os.makedirs(os.path.join(vdir, "pan"), exist_ok=True)
        frames = []
        base = rng.randint(0, 160, (h, w, 3)).astype(np.uint8)
        for f in range(n_frames):
            ip = os.path.join(vdir, "img", f"{f:04d}.jpg")
            pp = os.path.join(vdir, "pan", f"{f:04d}.png")
            if not (os.path.exists(ip) and os.path.exists(pp)):
                img = base.copy()
                pan = np.full((h, w), 2, np.int32)
                x0 = (40 + 25 * f + 60 * v) % (w - 220)
                y0 = (60 + 12 * f) % (h - 260)
                img[y0:y0 + 240, x0:x0 + 200] = [200, 60 + (10 * f) % 19, 40]
                pan[y0:y0 + 240, x0:x0 + 200] = 1
                img[50:170, w - 260:w - 60] = [30, 200, 180]
                pan[50:170, w - 260:w - 60] = 4
                Image.fromarray(img).save(ip, quality=90)
                from axial_vs_tpu.data.panoptic_utils import id2rgb

                Image.fromarray(id2rgb(pan)).save(pp)
            frames.append(dict(
                image_id=f"v{v}_f{f}",
                file_name=ip,
                pan_seg_file_name=pp,
                segments_info=[
                    dict(id=1, category_id=thing_class, iscrowd=0,
                         isthing=True),
                    dict(id=4, category_id=thing_class, iscrowd=0,
                         isthing=True),
                    dict(id=2, category_id=stuff_class, iscrowd=0,
                         isthing=False),
                ],
                height=h, width=w,
            ))
        videos.append(dict(video_id=f"video{v}", frames=frames))
    return videos

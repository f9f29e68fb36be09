#!/usr/bin/env python
"""VIPSeg -> DVPS-format conversion (T17, mirrors
`MaXTron_Tube-Link/tools/dataset/convert_vipseg_dvps.py` semantics):
splits the panoVIPSeg json + panomask PNGs into per-frame semantic +
instance PNGs (cat in channel 0, instance id in channels 1-2) used by the
DVPS-style datasets."""
import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from axial_vs_tpu.data.panoptic_utils import rgb2id  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--panomasks", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    with open(args.json) as f:
        data = json.load(f)
    cat_by_id = {c["id"]: c for c in data["categories"]}

    for vid in data["videos"]:
        out_dir = os.path.join(args.output, vid["video_id"])
        os.makedirs(out_dir, exist_ok=True)
        anns = {a["image_id"]: a for a in vid.get("annotations", [])}
        for img in vid["images"]:
            ann = anns.get(img["id"])
            if ann is None:
                continue
            pan = rgb2id(
                np.asarray(
                    Image.open(
                        os.path.join(args.panomasks, vid["video_id"], ann["file_name"])
                    ).convert("RGB")
                )
            )
            out = np.zeros(pan.shape + (3,), np.uint8)
            inst_counter = {}
            for seg in ann["segments_info"]:
                m = pan == seg["id"]
                cat = seg["category_id"]
                out[..., 0][m] = cat
                if cat_by_id.get(cat, {}).get("isthing", 0):
                    k = inst_counter.setdefault(cat, 0) + 1
                    inst_counter[cat] = k
                    out[..., 1][m] = k % 256
                    out[..., 2][m] = k // 256
            Image.fromarray(out).save(
                os.path.join(out_dir, ann["file_name"].replace(".png", "_dvps.png"))
            )
    print("done")


if __name__ == "__main__":
    main()

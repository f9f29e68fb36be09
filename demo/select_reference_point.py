"""Mark an attention reference point on an image.

Companion to ``demo_video.py --attn``: draws a filled circle at the chosen
(h, w) pixel so the trajectory-attention maps extracted for that query
location can be presented next to the location itself (reference
`demo_attn/select_reference_point.py:1-34`).

Usage:
  python demo/select_reference_point.py input.jpg marked.jpg --h 240 --w 512
"""
from __future__ import annotations

import argparse

from PIL import Image, ImageDraw


def mark_point(image_path: str, output_path: str, h: int, w: int,
               radius: int = 20, color: str = "red"):
    img = Image.open(image_path)
    draw = ImageDraw.Draw(img)
    draw.ellipse([(w - radius, h - radius), (w + radius, h + radius)],
                 outline=color, fill=color, width=2)
    img.save(output_path)
    return img.size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--h", type=int, required=True, help="row (pixels)")
    ap.add_argument("--w", type=int, required=True, help="column (pixels)")
    ap.add_argument("--radius", type=int, default=20)
    args = ap.parse_args()
    size = mark_point(args.input, args.output, args.h, args.w, args.radius)
    print(f"marked ({args.h}, {args.w}) on {size[0]}x{size[1]} -> {args.output}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Weight conversion CLI (V25): torch .pth/.pkl checkpoints -> this
framework's pickled param trees.

  python tools/convert_weights.py --src R-50.pth --arch resnet50 --out r50.npz.pkl
  python tools/convert_weights.py --src convnext_large_22k.pth --arch convnext \
      --depths 3 3 27 3 --out cnl.pkl
  python tools/convert_weights.py --src wc_model.pkl --prepare-cc --out cc_init.pkl
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from axial_vs_tpu.utils.torch_convert import (  # noqa: E402
    convert_torchvision_resnet, convert_timm_convnext, prepare_cc_weights,
)


def load_torch_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--arch", choices=["resnet50", "resnet101", "convnext", "swin"],
                    default=None)
    ap.add_argument("--depths", nargs=4, type=int, default=[3, 3, 27, 3])
    ap.add_argument("--prepare-cc", action="store_true",
                    help="clone predictor weights into cc_module keys")
    args = ap.parse_args()

    if args.prepare_cc:
        with open(args.src, "rb") as f:
            variables = pickle.load(f)
        out = prepare_cc_weights(variables)
    else:
        sd = load_torch_state_dict(args.src)
        if args.arch in ("resnet50", "resnet101"):
            depth = int(args.arch[6:])
            params, stats = convert_torchvision_resnet(sd, depth=depth)
            out = {"params": {"backbone": params}, "batch_stats": {"backbone": stats}}
        elif args.arch == "convnext":
            params = convert_timm_convnext(sd, depths=tuple(args.depths))
            out = {"params": {"backbone": params}}
        elif args.arch == "swin":
            from axial_vs_tpu.utils.torch_convert import convert_swin
            params = convert_swin(sd, depths=tuple(args.depths))
            out = {"params": {"backbone": params}}
        else:
            raise SystemExit("--arch required unless --prepare-cc")

    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Weight conversion CLI (V25): torch .pth/.pkl checkpoints -> this
framework's pickled param trees.

  python tools/convert_weights.py --src R-50.pth --arch resnet50 --out r50.npz.pkl
  python tools/convert_weights.py --src convnext_large_22k.pth --arch convnext \
      --depths 3 3 27 3 --out cnl.pkl
  python tools/convert_weights.py --src wc_model.pkl --prepare-cc --out cc_init.pkl
  python tools/convert_weights.py --src vitaev2_s.pth --arch vitae --depths 2 2 6 2 --out vitae.pkl
  python tools/convert_weights.py --src raft-things.pth --arch raft --out raft.pkl
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from axial_vs_tpu.utils.torch_convert import (  # noqa: E402
    convert_maxtron_wc, convert_torchvision_resnet, convert_timm_convnext,
    prepare_cc_weights,
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
    ap.add_argument("--arch", choices=["resnet50", "resnet101", "convnext",
                                       "swin", "stdc", "vitae", "raft",
                                       "maxtron_wc", "maxtron_wc_convnext"],
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
        if args.arch in ("maxtron_wc", "maxtron_wc_convnext"):
            # full d2 MaXTron WC checkpoint (backbone + sem_seg_head)
            bb = ("convnext" if args.arch.endswith("convnext")
                  else "resnet50")
            out = convert_maxtron_wc(sd, backbone=bb,
                                     depths=tuple(args.depths))
        elif args.arch in ("resnet50", "resnet101"):
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
        elif args.arch == "stdc":
            from axial_vs_tpu.utils.torch_convert import convert_stdc
            params, stats = convert_stdc(sd)
            out = {"params": {"backbone": params}, "batch_stats": {"backbone": stats}}
        elif args.arch == "vitae":
            from axial_vs_tpu.utils.torch_convert import convert_vitae_vsa
            params, stats = convert_vitae_vsa(sd, nc_depths=tuple(args.depths))
            out = {"params": {"backbone": params}, "batch_stats": {"backbone": stats}}
        elif args.arch == "raft":
            from axial_vs_tpu.utils.torch_convert import convert_raft
            sd = {(k[7:] if k.startswith("module.") else k): v
                  for k, v in sd.items()}
            params, stats = convert_raft(sd)
            out = {"params": params, "batch_stats": stats}
        else:
            raise SystemExit("--arch required unless --prepare-cc")

    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Video training/eval CLI — the `train_net_video.py` equivalent (V1).

Usage:
  python tools/train_net_video.py --config-file configs/vipseg/maxtron_wc_r50.yaml \
      [--resume] [--eval-only] [--opts solver.base_lr 1e-4 ...]

One process drives all local chips through a 'data' mesh; multi-host slices
call ``jax.distributed.initialize`` first (set JAX_COORDINATOR_ADDRESS etc.).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The sandbox's sitecustomize imports jax at interpreter startup, so
# JAX_PLATFORMS in the environment is read too early — honor it here
# (same trick as tests/conftest.py; needed to smoke-run CLIs on CPU while
# a benchmark owns the single TPU process slot).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--format-only", default=None, metavar="OUT_JSON",
                    help="VIS: dump YTVIS submission JSON instead of/along "
                         "with metrics (reference tools/test_video.py "
                         "--format-only)")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() for multi-host")
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=[])
    return ap.parse_args()


def setup(args):
    from axial_vs_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main():
    args = parse_args()
    if args.distributed:
        import jax

        jax.distributed.initialize()
    cfg = setup(args)

    # dataset registration side effects
    import axial_vs_tpu.data.builtin  # noqa: F401

    from axial_vs_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg)
    if args.eval_only:
        from axial_vs_tpu.engine.evaluator_loop import (
            evaluate_coco_panoptic, evaluate_vipseg, evaluate_ytvis)

        trainer.resume_or_load(resume=args.resume)
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        test_name = cfg.datasets.test[0]
        if test_name.startswith(("ytvis", "ovis")) or args.format_only:
            results = evaluate_ytvis(cfg, trainer.module, variables,
                                     format_only_path=args.format_only)
        elif test_name.startswith(("coco", "ade20k", "cityscapes_fine")):
            results = evaluate_coco_panoptic(cfg, trainer.module, variables)
        else:
            results = evaluate_vipseg(cfg, trainer.module, variables)
        print(results)
        return
    trainer.train(resume=args.resume)


if __name__ == "__main__":
    main()

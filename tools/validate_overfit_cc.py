"""End-to-end learning validation for the MaXTron CROSS-CLIP (CC) stage:
train ONLY the CrossClipTrackingModule on top of a frozen, already-overfit
WC segmenter and drive whole-video VPQ on the training fixture to the
target (VERDICT r4 "what's missing" #2 — the CC stage had loss-level tests
but no closed train->infer->metric loop).

This mirrors the reference's CC recipe exactly
(`MaXTron_Video-kMaX/maxtron_deeplab/maxtron_cc_model.py:104-108`): the
backbone + kMaX + WC head run frozen (stop_gradient inside
``MaXTronCCModel``), per-clip cluster centers are Hungarian-aligned across
clips, and only the CC module (trajectory attention over clips + temporal
ASPP + video-level predictor) trains. Inference is the REAL CC path:
``CCInferencePipeline`` (whole video in one jit) through the REAL
``evaluate_vipseg`` evaluator loop (VIPSegEvaluator re-ID + windowed VPQ).

Determinism: same rules as tools/validate_overfit.py — synchronous seeded
mapper (num_workers=0), pass = VPQ >= target at the FINAL eval, early stop
only after TWO consecutive at-target evals.

Run (CPU; trains the WC stage first if --wc-params is absent):
  JAX_PLATFORMS=cpu python tools/validate_overfit.py --steps 800 \
      --eval-every 100 --jitter 1.0 1.0 --save-params /tmp/axialvs_wc.pkl
  JAX_PLATFORMS=cpu python tools/validate_overfit_cc.py \
      --wc-params /tmp/axialvs_wc.pkl [--steps 300] [--eval-every 50]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--wc-params", default="/tmp/axialvs_wc.pkl",
                    help="pickle from validate_overfit --save-params; if "
                         "absent, the WC stage is trained first via a "
                         "subprocess (adds ~30 min)")
    ap.add_argument("--out", default="/tmp/axialvs_overfit")
    args = ap.parse_args()

    if not os.path.exists(args.wc_params):
        import subprocess

        print(f"{args.wc_params} missing -> training the WC stage first "
              "(tools/validate_overfit.py)", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "validate_overfit.py"),
             "--steps", "800", "--eval-every", "100", "--jitter", "1.0",
             "1.0", "--out", args.out, "--save-params", args.wc_params],
            env=dict(os.environ)).returncode
        if rc != 0:
            print("WC stage failed; aborting CC validation", flush=True)
            sys.exit(rc)

    import jax
    import jax.numpy as jnp
    import optax

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from axial_vs_tpu.data.loader import ClipDataLoader
    from axial_vs_tpu.data.vipseg import VIPSegClipMapper
    from axial_vs_tpu.engine.evaluator_loop import evaluate_vipseg
    from axial_vs_tpu.engine.lr_schedule import tf2_warmup_poly_lr
    from axial_vs_tpu.engine.train_step import TrainState, make_train_step
    from axial_vs_tpu.losses.criterion import SetCriterion
    from axial_vs_tpu.models.kmax import build_segmenter
    from axial_vs_tpu.models.maxtron_cc import MaXTronCCModel
    from axial_vs_tpu.models.video_inference import CCInferencePipeline
    from tests.fixtures_vipseg import synthesize_vipseg_videos

    # ---- fixture + config: IDENTICAL to tools/validate_overfit.py -------
    videos = synthesize_vipseg_videos(
        args.out, n_videos=2, n_frames=8, hw=(96, 160),
        thing_class=0, stuff_class=1)
    name = "overfit_fixture"
    if name not in DatasetCatalog:
        DatasetCatalog.register(name, lambda: videos)
    meta = MetadataCatalog.get(name)
    meta.contiguous_to_dataset_id = [0, 1]
    meta.thing_dataset_id_to_contiguous_id = {0: 0}
    meta.stuff_dataset_id_to_contiguous_id = {1: 1}
    meta.label_divisor = 1000
    meta.ignore_label = 255

    t, t_video, num_classes = 2, 8, 2
    cfg = get_default_config()
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = num_classes
    cfg.input.image_size = [97, 161]
    cfg.input.num_clip_frames = t
    cfg.input.num_video_frames = t_video
    cfg.model.maxtron.wc.enable = True
    cfg.model.maxtron.wc.conv_dims = 64
    cfg.model.maxtron.wc.dim_feedforward = 128
    cfg.model.maxtron.wc.spatial_layers = 2
    cfg.model.maxtron.wc.temporal_layers = 2
    cfg.model.kmax.trans_dec.num_object_queries = 16
    cfg.model.kmax.pixel_dec.dec_channels = [64, 48, 32, 16]
    cfg.model.kmax.trans_dec.dec_layers = [1, 1, 1]
    cfg.output_dir = args.out
    cfg.datasets.test = [name]

    segmenter = build_segmenter(cfg, num_frames=t, train=False)
    cc = cfg.model.maxtron.cc
    model = MaXTronCCModel(
        segmenter=segmenter, num_classes=num_classes,
        num_clip_frames=t, num_video_frames=t_video,
        cc_num_layers=cc.num_layers,
        cc_kernel_sizes=tuple(cc.kernel_sizes),
        cc_atrous_rates=tuple(cc.atrous_rates),
        cc_norm_fn=cc.norm_fn, exact_matching=False)
    criterion = SetCriterion(
        num_classes=num_classes, losses=("labels", "masks"),
        weights={"loss_ce": 3.0, "loss_mask": 0.3, "loss_dice": 3.0},
        exact_matching=False)

    mapper = VIPSegClipMapper(
        image_size=tuple(cfg.input.image_size), num_frames=t_video,
        max_instances=cfg.model.kmax.trans_dec.num_object_queries,
        min_scale=1.0, max_scale=1.0, copy_paste=False, seed=0)
    loader = ClipDataLoader(videos, mapper, batch_size=1, num_workers=0,
                            prefetch=2, seed=0)

    rng = jax.random.PRNGKey(0)
    images0 = jnp.zeros((t_video, *cfg.input.image_size, 3), jnp.float32)
    variables = model.init(rng, images0, train=True)
    with open(args.wc_params, "rb") as fh:
        wc = pickle.load(fh)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    assert "segmenter" in params, sorted(params)
    params["segmenter"] = wc["params"]
    batch_stats["segmenter"] = wc["batch_stats"]

    # only the CC module trains (segmenter outputs are stop_gradient'ed —
    # its grads are exactly zero — but AdamW weight decay would still move
    # zero-grad params, so mask the segmenter out entirely, matching the
    # reference's frozen-backbone optimizer group)
    mask = {k: jax.tree.map(lambda _, kk=k: kk != "segmenter", v)
            for k, v in params.items()}
    tx = optax.masked(
        optax.adamw(tf2_warmup_poly_lr(args.lr, args.steps, 0),
                    weight_decay=0.05),
        mask)

    state = TrainState(
        step=jnp.zeros([], jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params))
    step_fn = jax.jit(make_train_step(model, criterion, tx))

    def put(nb):
        tg = {k: jnp.asarray(v) for k, v in nb["targets"].items()}
        tg["masks"] = tg["masks"].astype(jnp.float32)
        return {"images": jnp.asarray(nb["images"], jnp.float32),
                "targets": tg}

    curve = []
    it = iter(loader)
    t0 = time.time()
    hits = 0
    for step in range(1, args.steps + 1):
        state, metrics = step_fn(
            state, put(next(it)), jax.random.fold_in(rng, step))
        if step % args.eval_every == 0 or step == args.steps:
            res = evaluate_vipseg(
                cfg, model,
                {"params": state.params, "batch_stats": state.batch_stats},
                pipeline_cls=CCInferencePipeline)
            vpq = float(res["vpq"])
            pw = res.get("per_window") or {}
            curve.append({
                "step": step,
                "loss": round(float(metrics["total_loss"]), 3),
                "vpq": round(vpq, 4),
                "things_pq": {k: round(v["things"]["pq"], 3)
                              for k, v in pw.items()},
                "stuff_pq": {k: round(v["stuff"]["pq"], 3)
                             for k, v in pw.items()},
                "loss_terms": {k: round(float(v), 3)
                               for k, v in sorted(metrics.items())
                               if k != "total_loss" and not k[-1].isdigit()},
            })
            print(json.dumps(curve[-1]), flush=True)
            hits = hits + 1 if vpq >= args.target else 0
            if hits >= 2:
                break
    loader.close()

    final = curve[-1]["vpq"] if curve else 0.0
    print(json.dumps({
        "metric": "CC-stage overfit (frozen WC) train->infer->video VPQ",
        "curve": [{k: c[k] for k in ("step", "loss", "vpq")} for c in curve],
        "final_vpq": final,
        "target": args.target,
        "minutes": round((time.time() - t0) / 60.0, 1),
        "passed": final >= args.target,
    }))
    sys.exit(0 if final >= args.target else 1)


if __name__ == "__main__":
    main()

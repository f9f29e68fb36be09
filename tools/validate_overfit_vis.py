"""End-to-end learning validation for the Tube-Link half: overfit a
2-video YTVIS fixture until whole-video AP on the training videos
approaches 1.0 (VERDICT r4 next-round task #3).

The kMaX half's loop-level proof is tools/validate_overfit.py; THIS closes
the same loop for the other half of the framework: the REAL tube training
path (YTVISClipMapper -> TubeLinkCriterion Hungarian assignment +
point-sampled BCE/dice -> AdamW) must teach the REAL whole-video inference
path (TubeLinkVISInference tube split -> cross-tube query Hungarian ->
fusion -> evaluate_ytvis devkit AP) to segment and TRACK the fixture.
Reference analog: TubeLinkVIS training
(`MaXTron_Tube-Link/models/video/tube_link_vis/mask2former_vis_tube.py:104-147`)
validated by its model zoo.

Determinism: no loader workers — the mapper is called synchronously with
one seeded RNG; two runs of this script produce identical curves.

Pass criterion: AP >= target at the FINAL eval; early stop only after TWO
consecutive at-target evals (same rules as validate_overfit.py, VERDICT r4
#1b).

Run (CPU, ~20-35 min):
  JAX_PLATFORMS=cpu python tools/validate_overfit_vis.py \
      [--steps 800] [--eval-every 100] [--target 0.9]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/axialvs_overfit_vis")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.data.catalog import DatasetCatalog
    from axial_vs_tpu.data.ytvis import YTVISClipMapper, register_ytvis
    from axial_vs_tpu.engine.evaluator_loop import evaluate_ytvis
    from axial_vs_tpu.engine.lr_schedule import tf2_warmup_poly_lr
    from axial_vs_tpu.models.backbones.resnet import ResNet
    from axial_vs_tpu.models.tube_link.criterion import TubeLinkCriterion
    from axial_vs_tpu.models.tube_link.detector import TubeLinkVIS
    from tests.fixtures_ytvis import synthesize_ytvis_videos

    t = 2
    hw = (96, 160)
    img_root, json_path = synthesize_ytvis_videos(
        args.out, n_videos=2, n_frames=8, hw=hw)
    name = "overfit_vis_fixture"
    if name in DatasetCatalog:
        DatasetCatalog.pop(name)
    register_ytvis(name, img_root, json_path)
    videos = DatasetCatalog.get(name)

    cfg = get_default_config()
    cfg.model.num_classes = 2
    cfg.input.image_size = list(hw)
    cfg.input.num_clip_frames = t
    cfg.input.num_video_frames = t
    cfg.model.tube_link.clip_len = t
    cfg.model.tube_link.overlap = 0
    cfg.model.tube_link.test_topk = 2
    cfg.datasets.test = [name]

    module = TubeLinkVIS(
        backbone=ResNet(depth=18,
                        out_features=("res2", "res3", "res4", "res5")),
        num_things_classes=2, num_queries=8, num_frames=t,
        feat_channels=64, out_channels=64, num_decoder_layers=3,
        num_heads=4, ffn_dim=256,
    )
    criterion = TubeLinkCriterion(
        num_things=2, num_points=512, match_points=512)

    mapper = YTVISClipMapper(
        image_size=hw, num_frames=t, frame_range=7,
        max_instances=4, min_scale=1.0, max_scale=1.0, seed=0,
        dataset_id_to_contiguous_id={1: 0, 2: 1})

    def next_batch():
        """One clip per fixture video, stacked: images (B*T, H, W, 3),
        targets stacked on the leading batch dim."""
        samples = [mapper(v) for v in videos]
        images = np.concatenate([s["images"] for s in samples], 0)
        tg = {
            k: np.stack([s["targets"][k] for s in samples], 0)
            for k in samples[0]["targets"]
        }
        return (jnp.asarray(images),
                {k: jnp.asarray(v) for k, v in tg.items()})

    rng = jax.random.PRNGKey(0)
    images0, _ = next_batch()
    variables = module.init(rng, images0, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # poly-decay the lr all the way to 0 within the run so the backbone
    # BN running stats converge onto the final weights and eval-mode
    # inference matches train-mode (same rationale as validate_overfit)
    tx = optax.adamw(tf2_warmup_poly_lr(args.lr, args.steps,
                                        warmup_iters=0),
                     weight_decay=0.05)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, targets, rng):
        def loss_fn(p):
            outputs, mutated = module.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])
            losses = criterion(rng, outputs, targets)
            return criterion.total(losses), (
                losses, mutated.get("batch_stats", batch_stats))

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        losses["total_loss"] = total
        return new_params, new_stats, new_opt, losses

    curve = []
    t0 = time.time()
    hits = 0
    for step in range(1, args.steps + 1):
        images, targets = next_batch()
        params, batch_stats, opt_state, metrics = train_step(
            params, batch_stats, opt_state, images, targets,
            jax.random.fold_in(rng, step))
        if step % args.eval_every == 0 or step == args.steps:
            res = evaluate_ytvis(
                cfg, module, {"params": params, "batch_stats": batch_stats})
            apv = float(res.get("AP", -1.0))
            rec = {
                "step": step,
                "loss": round(float(metrics["total_loss"]), 3),
                "AP": round(apv, 4),
                "AP50": round(float(res.get("AP50", -1.0)), 4),
                "AP75": round(float(res.get("AP75", -1.0)), 4),
                "loss_terms": {
                    k: round(float(v), 3)
                    for k, v in sorted(metrics.items())
                    if k != "total_loss" and not k.startswith("d")},
            }
            curve.append(rec)
            print(json.dumps(rec), flush=True)
            hits = hits + 1 if apv >= args.target else 0
            if hits >= 2:
                break

    final = curve[-1]["AP"] if curve else -1.0
    print(json.dumps({
        "metric": "Tube-Link VIS overfit 2-video fixture train->infer->AP",
        "curve": [{k: c[k] for k in ("step", "loss", "AP")} for c in curve],
        "final_ap": final,
        "target": args.target,
        "minutes": round((time.time() - t0) / 60.0, 1),
        "passed": final >= args.target,
    }))
    sys.exit(0 if final >= args.target else 1)


if __name__ == "__main__":
    main()

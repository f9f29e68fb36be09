"""End-to-end learning validation: overfit a 2-video VIPSeg fixture until
VPQ on the training videos approaches 1.0 (VERDICT r2 next-round task #2).

Unit parity (matcher/criterion/optimizer) proves formulas; THIS proves the
wiring: the REAL train loop (mapper -> loader -> train_step with auction
matching + AdamW/poly) must teach the REAL inference path
(WCInferencePipeline clip stitching -> VIPSegEvaluator re-ID -> VPQ core)
to segment the fixture. A sign flip, mis-weighted loss, or matcher mis-wire
caps VPQ far below 1 even while "loss goes down".

Determinism (VERDICT r4 #1a): the loader runs SYNCHRONOUSLY
(num_workers=0, one RNG) — with >=2 workers the batch ARRIVAL order is
timing-dependent even though each worker is seeded, so two "seeded" runs
diverge from the first step. Two runs of this script on the same platform
now produce identical curves.

Pass criterion (VERDICT r4 #1b): VPQ >= target at the FINAL eval. Early
stop fires only after TWO CONSECUTIVE evals at/above target (a wall-clock
courtesy that cannot credit a single transient spike — the round-4 failure
mode).

Run (CPU, ~30 min):
  JAX_PLATFORMS=cpu python tools/validate_overfit.py \
      [--steps 800] [--eval-every 100] [--target 0.9]

Prints a VPQ curve with per-eval diagnostics and exits 0 iff the final
eval's VPQ >= target. The resulting curve is recorded in STATUS.md.
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


def _dissect(cfg, eval_module, variables, videos, meta):
    """Trace video 0 through the REAL video-wise inference path, printing
    every stage's state so a things-PQ failure can be localized."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from axial_vs_tpu.models.video_inference import (
        WCInferencePipeline, preprocess_frames, match_from_embds)
    from axial_vs_tpu.models.postprocess import panoptic_inference

    num_classes = len(meta.contiguous_to_dataset_id)
    thing_mask = np.zeros((num_classes,), bool)
    for _, ci in meta.thing_dataset_id_to_contiguous_id.items():
        thing_mask[ci] = True
    pipe = WCInferencePipeline(
        eval_module, variables,
        num_clip_frames=cfg.input.num_clip_frames,
        input_size=cfg.input.image_size,
        pixel_mean=cfg.input.pixel_mean, pixel_std=cfg.input.pixel_std,
        thing_class_mask=thing_mask,
        contiguous_to_dataset_id=np.asarray(meta.contiguous_to_dataset_id),
        label_divisor=meta.label_divisor,
        pixel_confidence_threshold=cfg.model.maxtron.test.pixel_confidence_threshold,
        class_threshold_thing=cfg.model.maxtron.test.class_threshold_thing,
        class_threshold_stuff=cfg.model.maxtron.test.class_threshold_stuff,
        overlap_threshold=cfg.model.maxtron.test.overlap_threshold,
        reorder_class_weight=cfg.model.maxtron.test.reorder_class_weight,
        reorder_mask_weight=cfg.model.maxtron.test.reorder_mask_weight,
    )
    frames = np.stack([
        np.asarray(Image.open(f["file_name"]).convert("RGB"))
        for f in videos[0]["frames"]])
    v, t = frames.shape[0], cfg.input.num_clip_frames
    images, sh, sw, _ = preprocess_frames(
        frames, cfg.input.pixel_mean, cfg.input.pixel_std,
        cfg.input.image_size)
    import math
    num_clips = math.ceil(v / t)
    logits_list, masks_list, embds_list = [], [], []
    for ci in range(num_clips):
        idx = [min(ci * t + k, v - 1) for k in range(t)]
        lo, ma, em = pipe._clip_forward(jax.device_put(images[idx]))
        logits_list.append(np.asarray(lo, np.float32))
        masks_list.append(np.asarray(ma, np.float32))
        embds_list.append(np.asarray(em, np.float32))

    def slot_report(tag, logits, masks):
        prob = np.asarray(jax.nn.softmax(logits, -1))
        pm = np.asarray(jax.nn.softmax(masks, -1))
        owner = pm.reshape(-1, pm.shape[-1]).argmax(-1)
        areas = np.bincount(owner, minlength=prob.shape[0])
        top = np.argsort(-areas)[:4]
        print(f"  {tag}: " + "  ".join(
            f"slot{si} area={areas[si]} cls={prob[si].argmax()} "
            f"p=({prob[si][0]:.3f},{prob[si][1]:.3f},{prob[si][-1]:.3f})"
            for si in top), flush=True)

    print("== dissect: per-clip slot stats (cls p=(thing,stuff,void)) ==",
          flush=True)
    for ci in range(num_clips):
        slot_report(f"clip{ci}", logits_list[ci], masks_list[ci])

    perms = [np.arange(embds_list[0].shape[0])]
    matched = [embds_list[0]]
    for i in range(1, num_clips):
        perm = match_from_embds(matched[-1], embds_list[i])
        perms.append(perm)
        matched.append(embds_list[i][perm])
    print("== alignment perms (clip i slots -> canonical) ==", flush=True)
    for i, p in enumerate(perms):
        moved = {a: b for a, b in enumerate(p) if a != b}
        print(f"  clip{i}: moved={moved or 'identity'}", flush=True)

    avg_logits = sum(l[p] for l, p in zip(logits_list, perms)) / num_clips
    stitched = np.concatenate(
        [m[..., p] for m, p in zip(masks_list, perms)], axis=0)
    print("== post-average slot stats ==", flush=True)
    slot_report("avg", avg_logits, stitched)

    result = jax.tree.map(
        np.asarray,
        panoptic_inference(
            jnp.asarray(avg_logits), jnp.asarray(stitched),
            jnp.asarray(thing_mask),
            pixel_confidence_threshold=cfg.model.maxtron.test.pixel_confidence_threshold,
            class_threshold_thing=cfg.model.maxtron.test.class_threshold_thing,
            class_threshold_stuff=cfg.model.maxtron.test.class_threshold_stuff,
            overlap_threshold=cfg.model.maxtron.test.overlap_threshold,
            reorder_class_weight=cfg.model.maxtron.test.reorder_class_weight,
            reorder_mask_weight=cfg.model.maxtron.test.reorder_mask_weight,
        ))
    print("== panoptic segments (visit order) ==", flush=True)
    for i in range(len(result.segment_valid)):
        if not bool(result.accepted[i]) and not bool(result.segment_valid[i]):
            continue
        print(f"  slot={int(result.slot_index[i])} valid="
              f"{bool(result.segment_valid[i])} id={int(result.segment_id[i])}"
              f" cat={int(result.segment_category[i])}"
              f" isthing={bool(result.segment_isthing[i])}", flush=True)
    # GT vs predicted id map agreement per frame (thing tube IoU)
    ids, _, _ = pipe.run_video(frames)
    from axial_vs_tpu.data.panoptic_utils import rgb2id
    for fi in (0, v // 2, v - 1):
        pan = rgb2id(np.asarray(
            Image.open(videos[0]["frames"][fi]["pan_seg_file_name"]).convert("RGB")))
        pred = ids[fi]
        for gt_id, nm in ((1, "thing1(moving)"), (4, "thing2(static)"),
                          (2, "stuff")):
            m = pan == gt_id
            if not m.any():
                continue
            vals, cnts = np.unique(pred[m], return_counts=True)
            best = vals[np.argmax(cnts)]
            iou = (np.logical_and(pred == best, m).sum()
                   / np.logical_or(pred == best, m).sum())
            print(f"  frame{fi} {nm}: best_pred_id={int(best)} "
                  f"iou={iou:.3f} cover={cnts.max() / m.sum():.3f}",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--jitter", type=float, nargs=2, default=[1.0, 1.0],
                    metavar=("MIN", "MAX"),
                    help="train-time random-scale range (1.0 1.0 = off)")
    ap.add_argument("--head-mult", type=float, default=1.0,
                    help="solver.prediction_head_multiplier. The reference "
                         "default 0.1 is tuned for fine-tuning from "
                         "pretrained image checkpoints; from-scratch "
                         "overfitting at a short horizon needs the heads "
                         "at full lr. Diagnosed round 4 (tools/diag_learn."
                         "py): the mask-logit BN gamma (init 0.1, "
                         "reference-exact) IS the softmax temperature of "
                         "the masks, and it can only grow ~lr*mult per "
                         "Adam step — at the old 5e-4 x 0.1 the per-pixel "
                         "winning prob could never cross the 0.4 "
                         "pixel-confidence inference threshold within any "
                         "reasonable step budget, which is what made VPQ "
                         "sit at 0.0 while the masks' argmax was already "
                         "~0.9 IoU (threshold-free probe).")
    ap.add_argument("--ce-weight", type=float, default=3.0,
                    help="loss_ce weight (reference default 3.0). "
                         "Harness knob for diagnosing threshold-margin "
                         "failures; loss FORMULAS stay reference-exact.")
    ap.add_argument("--dissect", action="store_true",
                    help="after the last step, dissect the video-wise "
                         "inference path on video 0: per-clip slot stats, "
                         "embedding-alignment permutations, post-average "
                         "class probs, and the accepted/rejected segments")
    ap.add_argument("--out", default="/tmp/axialvs_overfit")
    ap.add_argument("--save-params", default=None, metavar="PATH",
                    help="after the run, pickle {params, batch_stats} of "
                         "the trained WC segmenter to PATH (consumed by "
                         "tools/validate_overfit_cc.py, which trains the "
                         "cross-clip module on top of the frozen result "
                         "— the reference's CC recipe, "
                         "maxtron_cc_model.py:104-108)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from axial_vs_tpu.data.loader import ClipDataLoader
    from axial_vs_tpu.data.vipseg import VIPSegClipMapper
    from axial_vs_tpu.engine.evaluator_loop import evaluate_vipseg
    from axial_vs_tpu.engine.lr_schedule import tf2_warmup_poly_lr
    from axial_vs_tpu.engine.optim import build_optimizer
    from axial_vs_tpu.engine.train_step import TrainState, make_train_step
    from axial_vs_tpu.losses.criterion import SetCriterion
    from axial_vs_tpu.models.kmax import build_segmenter
    from tests.fixtures_vipseg import synthesize_vipseg_videos

    # ---- fixture: 2 videos, contiguous category ids (0=thing, 1=stuff) ----
    # >= 6 frames: VPQ averages windows {1,2,4,6}, and a window longer
    # than the video contributes an empty PQStat (pq 0, reference-exact
    # `range(0, v - nframes + 1)` semantics) — a 4-frame fixture caps the
    # mean VPQ at 0.75 no matter how well the model fits (round-4 find)
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

    # ---- small-but-real WC config --------------------------------------
    t = 2
    num_classes = 2
    cfg = get_default_config()
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = num_classes
    cfg.input.image_size = [97, 161]
    cfg.input.num_clip_frames = t
    cfg.input.num_video_frames = t
    cfg.model.maxtron.wc.enable = True
    cfg.model.maxtron.wc.conv_dims = 64
    cfg.model.maxtron.wc.dim_feedforward = 128
    cfg.model.maxtron.wc.spatial_layers = 2
    cfg.model.maxtron.wc.temporal_layers = 2
    cfg.model.kmax.trans_dec.num_object_queries = 16
    cfg.model.kmax.pixel_dec.dec_channels = [64, 48, 32, 16]
    cfg.model.kmax.trans_dec.dec_layers = [1, 1, 1]
    cfg.solver.base_lr = args.lr
    cfg.solver.prediction_head_multiplier = args.head_mult
    cfg.solver.warmup_iters = 0  # warmup off (VERDICT task #2)
    # poly-decay ALL the way to 0 within the run (the reference's own
    # schedule shape): as the lr anneals the params freeze, so the BN
    # running stats (momentum 0.01 ~ 100-step memory) converge onto the
    # final weights and eval-mode (running-stat) inference matches
    # train-mode — without this the eval probe lags ~100 steps behind a
    # still-moving model and VPQ wobbles (diagnosed round 4, diag_learn)
    cfg.solver.max_iter = args.steps
    cfg.output_dir = args.out
    cfg.datasets.test = [name]

    module = build_segmenter(cfg, num_frames=t, train=True)
    eval_module = build_segmenter(cfg, num_frames=t, train=False)
    criterion = SetCriterion(
        num_classes=num_classes,
        weights={"loss_ce": args.ce_weight, "loss_mask": 0.3,
                 "loss_dice": 3.0,
                 "loss_pixel_insdis": 1.0, "loss_aux_semantic": 1.0},
        pixel_insdis_sample_k=256,
        aux_semantic_sample_k=256,
        exact_matching=False,
    )
    mapper = VIPSegClipMapper(
        image_size=tuple(cfg.input.image_size), num_frames=t,
        max_instances=cfg.model.kmax.trans_dec.num_object_queries,
        min_scale=args.jitter[0], max_scale=args.jitter[1],
        copy_paste=False, seed=0)
    # num_workers=0: synchronous, single-RNG, deterministic batch order
    # (VERDICT r4 #1a — worker processes made arrival order timing-
    # dependent, so "seeded" runs were not reproducible)
    loader = ClipDataLoader(videos, mapper, batch_size=2, num_workers=0,
                            prefetch=2, seed=0)

    rng = jax.random.PRNGKey(0)
    images0 = jnp.zeros((2 * t, *cfg.input.image_size, 3), jnp.float32)
    variables = module.init(rng, images0, train=True)
    tx = build_optimizer(
        cfg, variables["params"],
        tf2_warmup_poly_lr(cfg.solver.base_lr, cfg.solver.max_iter,
                           warmup_iters=0))
    state = TrainState(
        step=jnp.zeros([], jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]))
    step_fn = jax.jit(make_train_step(module, criterion, tx))

    def put(nb):
        tg = {k: jnp.asarray(v) for k, v in nb["targets"].items()}
        tg["masks"] = tg["masks"].astype(jnp.float32)
        return {"images": jnp.asarray(nb["images"], jnp.float32),
                "targets": tg}

    # ---- threshold-margin probe (diagnoses PQ flips at the inference
    # thresholds: things need class prob > 0.7, stuff > 0.5, pixels > 0.4)
    probe_batch = put(next(iter(ClipDataLoader(
        videos, mapper, batch_size=2, num_workers=0, seed=7))))

    @jax.jit
    def probe(params, batch_stats):
        out = eval_module.apply(
            {"params": params, "batch_stats": batch_stats},
            probe_batch["images"], train=False)
        prob = jax.nn.softmax(out["pred_logits"], -1)  # (B, N, C+1)
        pm = jax.nn.softmax(out["pred_masks"], -1)     # (..., N) over slots
        b = prob.shape[0]
        n = prob.shape[1]
        # per-slot joint stats on sample 0: which slots OWN pixels (argmax
        # over slots), and what class/conf they carry — a slot can own the
        # thing's pixels while its class prob sits under the 0.7 inference
        # threshold (then panoptic inference drops the segment even though
        # some OTHER slot has thing prob 1.0)
        owner = jnp.argmax(pm.reshape(b, -1, n), axis=-1)          # (B, S)
        area = (owner[0, :, None] == jnp.arange(n)[None]).sum(0)   # (N,)
        top = jnp.argsort(-area)[:4]
        return {
            "max_thing_prob": prob[..., 0].max(),
            "max_stuff_prob": prob[..., 1].max(),
            "mask_conf_p99": jnp.percentile(pm.max(axis=-1), 99.0),
            "top_slots": top,
            "top_areas": area[top],
            "top_cls": jnp.argmax(out["pred_logits"][0], -1)[top],
            "top_cls_prob": prob[0].max(-1)[top],
        }

    def bn_delta(prev, cur):
        if prev is None:
            return None
        num = sum(float(jnp.sum((a - b).astype(jnp.float32) ** 2))
                  for a, b in zip(jax.tree.leaves(prev),
                                  jax.tree.leaves(cur)))
        den = sum(float(jnp.sum(b.astype(jnp.float32) ** 2))
                  for b in jax.tree.leaves(cur))
        return round(float(np.sqrt(num / max(den, 1e-12))), 6)

    curve = []
    it = iter(loader)
    t0 = time.time()
    prev_bn = None
    hits = 0
    for step in range(1, args.steps + 1):
        state, metrics = step_fn(
            state, put(next(it)), jax.random.fold_in(rng, step))
        if step % args.eval_every == 0 or step == args.steps:
            loss = float(metrics["total_loss"])
            res = evaluate_vipseg(
                cfg, eval_module,
                {"params": state.params, "batch_stats": state.batch_stats})
            vpq = float(res["vpq"])
            pw = res.get("per_window") or {}
            p = jax.tree.map(
                lambda v: (round(float(v), 4) if v.ndim == 0
                           else np.round(np.asarray(v, np.float64), 4).tolist()),
                probe(state.params, state.batch_stats))
            curve.append({
                "step": step, "loss": round(loss, 3), "vpq": round(vpq, 4),
                "things_pq": {k: round(v["things"]["pq"], 3)
                              for k, v in pw.items()},
                "stuff_pq": {k: round(v["stuff"]["pq"], 3)
                             for k, v in pw.items()},
                **p,
                "bn_drift": bn_delta(prev_bn, state.batch_stats),
                "loss_terms": {k: round(float(v), 3)
                               for k, v in sorted(metrics.items())
                               if k != "total_loss"
                               and not k[-1].isdigit()},
            })
            prev_bn = jax.tree.map(lambda x: x, state.batch_stats)
            print(json.dumps(curve[-1]), flush=True)
            # early stop ONLY after two consecutive at-target evals: a
            # single transient spike must not end the run "passed"
            # (VERDICT r4 #1b)
            hits = hits + 1 if vpq >= args.target else 0
            if hits >= 2:
                break
    loader.close()

    if args.dissect:
        _dissect(cfg, eval_module,
                 {"params": state.params, "batch_stats": state.batch_stats},
                 videos, meta)

    if args.save_params:
        import pickle

        with open(args.save_params, "wb") as fh:
            pickle.dump(jax.tree.map(np.asarray, {
                "params": state.params,
                "batch_stats": state.batch_stats,
            }), fh)
        print(f"saved trained segmenter variables to {args.save_params}",
              flush=True)

    final = curve[-1]["vpq"] if curve else 0.0
    print(json.dumps({
        "metric": "overfit 2-video fixture train->infer->VPQ",
        "curve": [{k: c[k] for k in ("step", "loss", "vpq")} for c in curve],
        "final_vpq": final,
        "target": args.target,
        "minutes": round((time.time() - t0) / 60.0, 1),
        "passed": final >= args.target,
    }))
    sys.exit(0 if final >= args.target else 1)


if __name__ == "__main__":
    main()

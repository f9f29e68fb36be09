"""Diagnostic: can the train loop memorize ONE fixed batch?

Instrumented bisection harness for the overfit failure (VERDICT r3 #1):
per-term losses, matched-dice / matched-class-prob stats, grad norms per
top-level param group, and a THRESHOLD-FREE probe (argmax-over-slots mask
IoU vs GT + max class prob) every K steps. If the probe saturates while
VPQ stays 0, the bug is in the inference/eval path; if it stays low, the
bug is in train_step/criterion/matcher.

Run:  JAX_PLATFORMS=cpu python tools/diag_learn.py [--steps 300] [--lr 1e-3]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--every", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--exact-matching", action="store_true")
    ap.add_argument("--decay", action="store_true",
                    help="poly-decay lr to 0 over --steps (max_iter=steps) "
                         "so the BN running stats converge onto frozen "
                         "weights by the end; default keeps lr ~flat")
    ap.add_argument("--head-mult", type=float, default=1.0,
                    help="solver.prediction_head_multiplier. The reference "
                         "default 0.1 is tuned for fine-tuning from a "
                         "pretrained image checkpoint; from-scratch "
                         "overfitting needs the heads (esp. the mask-logit "
                         "BN gamma, init 0.1 = the softmax temperature) to "
                         "move at full lr.")
    ap.add_argument("--losses", default="labels,masks,pixels,aux_semantic")
    ap.add_argument("--out", default="/tmp/axialvs_diag")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.data.vipseg import VIPSegClipMapper
    from axial_vs_tpu.engine.lr_schedule import tf2_warmup_poly_lr
    from axial_vs_tpu.engine.optim import build_optimizer
    from axial_vs_tpu.engine.train_step import TrainState, make_train_step
    from axial_vs_tpu.losses.criterion import SetCriterion
    from axial_vs_tpu.losses.matcher import hungarian_match
    from axial_vs_tpu.models.kmax import build_segmenter
    from tests.fixtures_vipseg import synthesize_vipseg_videos

    videos = synthesize_vipseg_videos(
        args.out, n_videos=2, n_frames=4, hw=(96, 160),
        thing_class=0, stuff_class=1)

    t = 2
    num_classes = 2
    cfg = get_default_config()
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = num_classes
    cfg.input.image_size = [96, 160]
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
    cfg.solver.warmup_iters = 0
    cfg.solver.max_iter = args.steps if args.decay else args.steps * 10
    cfg.solver.prediction_head_multiplier = args.head_mult

    module = build_segmenter(cfg, num_frames=t, train=True)
    criterion = SetCriterion(
        num_classes=num_classes,
        weights={"loss_ce": 3.0, "loss_mask": 0.3, "loss_dice": 3.0,
                 "loss_pixel_insdis": 1.0, "loss_aux_semantic": 1.0},
        pixel_insdis_sample_k=256,
        aux_semantic_sample_k=256,
        exact_matching=args.exact_matching,
        losses=tuple(args.losses.split(",")),
    )
    mapper = VIPSegClipMapper(
        image_size=tuple(cfg.input.image_size), num_frames=t,
        max_instances=16, min_scale=1.0, max_scale=1.0, copy_paste=False,
        seed=0)

    # ONE fixed batch: first clip of each video, no augmentation jitter
    samples = [mapper(videos[0]), mapper(videos[1])]
    batch = {
        "images": jnp.asarray(
            np.stack([s["images"] for s in samples]).reshape(
                2 * t, *cfg.input.image_size, 3), jnp.float32),
        "targets": {
            k: jnp.asarray(np.stack([s["targets"][k] for s in samples]))
            for k in samples[0]["targets"]
        },
    }
    batch["targets"]["masks"] = batch["targets"]["masks"].astype(jnp.float32)
    tg = batch["targets"]
    print("target labels:", np.asarray(tg["labels"])[:, :6].tolist(),
          "valid:", np.asarray(tg["valid"]).sum(axis=1).tolist(),
          "mask px:", np.asarray(tg["masks"]).sum(axis=(2, 3, 4))[:, :4].tolist(),
          flush=True)

    rng = jax.random.PRNGKey(0)
    variables = module.init(
        rng, jnp.zeros((2 * t, *cfg.input.image_size, 3), jnp.float32),
        train=True)
    tx = build_optimizer(
        cfg, variables["params"],
        tf2_warmup_poly_lr(cfg.solver.base_lr, cfg.solver.max_iter,
                           warmup_iters=0))
    state = TrainState(
        step=jnp.zeros([], jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]))
    step_fn = jax.jit(make_train_step(module, criterion, tx))

    @jax.jit
    def probe(params, batch_stats):
        out = module.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], train=False)
        pm = out["pred_masks"]  # (B, T, H4, W4, N) expected
        b = pm.shape[0]
        n = pm.shape[-1]
        pm_bns = jnp.moveaxis(pm, -1, 1).reshape(b, n, -1)
        gt = batch["targets"]["masks"].reshape(
            b, batch["targets"]["masks"].shape[1], -1)
        valid = batch["targets"]["valid"]
        # threshold-free: hard argmax over slots
        hard = jax.nn.one_hot(jnp.argmax(pm_bns, axis=1), n, axis=1)
        inter = jnp.einsum("bns,bms->bnm", hard, gt)
        union = (hard.sum(-1)[:, :, None] + gt.sum(-1)[:, None, :]) - inter
        iou = inter / jnp.maximum(union, 1.0)  # (B, N, M)
        best_iou = jnp.where(valid, iou.max(axis=1), 0.0)
        # matched stats through the real matcher
        m = hungarian_match(out, batch["targets"], exact=False)
        cls_prob = jax.nn.softmax(out["pred_logits"], -1)
        return {
            "probe_iou": best_iou.sum() / jnp.maximum(valid.sum(), 1),
            "probe_iou_per_gt": best_iou,
            "matched_dice": m.matched_dice.sum() / jnp.maximum(valid.sum(), 1),
            "matched_cls": m.matched_cls_prob.sum() / jnp.maximum(valid.sum(), 1),
            "max_nonvoid_prob": cls_prob[..., :-1].max(),
            "mean_void_prob": cls_prob[..., -1].mean(),
        }

    def mask_bn_gammas(params):
        """All pixel_space_mask_batch_norm scale values (the softmax
        temperature of the mask logits; init 0.1 per reference)."""
        out = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            keys = [p.key for p in path if hasattr(p, "key")]
            if "pixel_space_mask_batch_norm" in keys and keys[-1] == "scale":
                out.append(round(float(jnp.ravel(leaf)[0]), 4))
        return out

    def gnorms(params, grads):
        flat = jax.tree_util.tree_leaves_with_path(grads)
        groups = {}
        for path, g in flat:
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            groups.setdefault(top, 0.0)
            groups[top] += float(jnp.sum(g.astype(jnp.float32) ** 2))
        return {k: round(float(np.sqrt(v)), 6) for k, v in groups.items()}

    # one-off: inspect the gradient composition at init
    def loss_fn(params):
        out, _ = module.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 999)})
        losses = criterion(jax.random.fold_in(rng, 998), out, batch["targets"])
        return criterion.weighted_total(losses), losses

    (tot0, losses0), grads0 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(state.params)
    print("init total:", float(tot0), flush=True)
    print("init losses:", {k: round(float(v), 4) for k, v in sorted(losses0.items())},
          flush=True)
    print("init grad norms by group:", gnorms(state.params, grads0), flush=True)

    t0 = time.time()
    for step in range(1, args.steps + 1):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, step))
        if step % args.every == 0 or step == 1:
            p = probe(state.params, state.batch_stats)
            rec = {
                "step": step,
                "total": round(float(metrics["total_loss"]), 4),
                **{k: round(float(v), 4) for k, v in sorted(metrics.items())
                   if not k[-1].isdigit() and k != "total_loss"},
                "probe_iou": round(float(p["probe_iou"]), 4),
                "matched_dice": round(float(p["matched_dice"]), 4),
                "matched_cls": round(float(p["matched_cls"]), 4),
                "max_cls": round(float(p["max_nonvoid_prob"]), 4),
                "void": round(float(p["mean_void_prob"]), 4),
                "mask_bn_gamma": mask_bn_gammas(state.params),
                "min": round((time.time() - t0) / 60, 1),
            }
            print(json.dumps(rec), flush=True)
    p = probe(state.params, state.batch_stats)
    print("final per-GT probe IoU:",
          np.round(np.asarray(p["probe_iou_per_gt"]), 3).tolist(), flush=True)


if __name__ == "__main__":
    main()

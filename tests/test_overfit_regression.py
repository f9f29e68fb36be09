"""Cheap in-suite learning regression (VERDICT r4 #8): 150 training steps
on the 2-video VIPSeg fixture must drive the THRESHOLD-FREE mask probe
(per-GT-segment best-slot argmax IoU, the tools/diag_learn.py probe) to
>= 0.8 — so a future criterion/matcher/optimizer mis-wire fails a test,
not a round. The full train->infer->VPQ proof (with the inference
thresholds in the loop) stays in tools/validate_overfit.py.

Threshold-free on purpose: at 150 steps the mask-logit BN temperature is
still warming up, so panoptic-threshold metrics (VPQ) lag ~200 steps
behind the argmax fit (diagnosed round 4, tools/diag_learn.py) — the
argmax IoU is the earliest robust learning signal.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_overfit_150step_argmax_iou(tmp_path):
    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.data.loader import ClipDataLoader
    from axial_vs_tpu.data.vipseg import VIPSegClipMapper
    from axial_vs_tpu.engine.lr_schedule import tf2_warmup_poly_lr
    from axial_vs_tpu.engine.optim import build_optimizer
    from axial_vs_tpu.engine.train_step import TrainState, make_train_step
    from axial_vs_tpu.losses.criterion import SetCriterion
    from axial_vs_tpu.models.kmax import build_segmenter
    from tests.fixtures_vipseg import synthesize_vipseg_videos

    steps = 150
    videos = synthesize_vipseg_videos(
        str(tmp_path), n_videos=2, n_frames=8, hw=(96, 160),
        thing_class=0, stuff_class=1)

    # same small-but-real WC config as tools/validate_overfit.py
    t = 2
    cfg = get_default_config()
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = 2
    cfg.input.image_size = [97, 161]
    cfg.input.num_clip_frames = t
    cfg.model.maxtron.wc.enable = True
    cfg.model.maxtron.wc.conv_dims = 64
    cfg.model.maxtron.wc.dim_feedforward = 128
    cfg.model.maxtron.wc.spatial_layers = 2
    cfg.model.maxtron.wc.temporal_layers = 2
    cfg.model.kmax.trans_dec.num_object_queries = 16
    cfg.model.kmax.pixel_dec.dec_channels = [64, 48, 32, 16]
    cfg.model.kmax.trans_dec.dec_layers = [1, 1, 1]
    cfg.solver.base_lr = 5e-3
    cfg.solver.prediction_head_multiplier = 1.0
    cfg.solver.warmup_iters = 0
    # lr trajectory IDENTICAL to the validated tools/validate_overfit.py
    # run (poly horizon 800), truncated at `steps`: decaying to 0 within
    # 150 steps starved the fit (measured mean IoU 0.703 — segments at
    # 0.23/0.54 were still moving when the lr died)
    cfg.solver.max_iter = 800

    module = build_segmenter(cfg, num_frames=t, train=True)
    eval_module = build_segmenter(cfg, num_frames=t, train=False)
    criterion = SetCriterion(
        num_classes=2,
        weights={"loss_ce": 3.0, "loss_mask": 0.3, "loss_dice": 3.0,
                 "loss_pixel_insdis": 1.0, "loss_aux_semantic": 1.0},
        pixel_insdis_sample_k=256, aux_semantic_sample_k=256,
        exact_matching=False)
    mapper = VIPSegClipMapper(
        image_size=tuple(cfg.input.image_size), num_frames=t,
        max_instances=16, min_scale=1.0, max_scale=1.0,
        copy_paste=False, seed=0)
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

    it = iter(loader)
    first_loss = last_loss = None
    for step in range(1, steps + 1):
        batch = put(next(it))
        state, metrics = step_fn(state, batch,
                                 jax.random.fold_in(rng, step))
        if step == 1:
            first_loss = float(metrics["total_loss"])
        last_loss = float(metrics["total_loss"])
    loader.close()
    assert np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)

    # threshold-free probe on a fresh deterministic batch: every GT
    # segment must be ~owned by some slot of the eval-mode forward
    probe = put(next(iter(ClipDataLoader(
        videos, mapper, batch_size=2, num_workers=0, seed=7))))
    out = eval_module.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        probe["images"], train=False)
    pm = np.asarray(out["pred_masks"], np.float32)  # (B, T, H4, W4, N)
    b, tt, h4, w4, n = pm.shape
    owner = pm.argmax(-1)  # (B, T, H4, W4)
    gt = np.asarray(probe["targets"]["masks"], np.float32)  # (B, M, T, h, w)
    gt = gt[..., :h4, :w4]
    valid = np.asarray(probe["targets"]["valid"])
    ious = []
    for bi in range(b):
        for mi in range(gt.shape[1]):
            if not valid[bi, mi] or gt[bi, mi].sum() == 0:
                continue
            g = gt[bi, mi] > 0.5  # (T, h4, w4)
            best = 0.0
            for si in range(n):
                p = owner[bi] == si
                inter = np.logical_and(p, g).sum()
                union = np.logical_or(p, g).sum()
                best = max(best, inter / max(union, 1))
            ious.append(best)
    assert ious, "fixture produced no valid GT segments"
    mean_iou = float(np.mean(ious))
    assert mean_iou >= 0.8, (mean_iou, ious)

"""Tube-Link stack tests: pixel decoder, head, criterion, detector inference."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.models.backbones.resnet import ResNet
from axial_vs_tpu.models.tube_link.detector import (
    TubeLinkVIS, TubeLinkVISInference, video_split,
)
from axial_vs_tpu.models.tube_link.criterion import TubeLinkCriterion
from axial_vs_tpu.models.tube_link.head import Mask2FormerVideoHeadTube


def test_video_split():
    assert video_split(10, 5) == [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
    assert video_split(7, 5) == [[0, 1, 2, 3, 4], [2, 3, 4, 5, 6]]
    assert video_split(4, 5) == [[0, 1, 2, 3]]
    assert video_split(6, 3, overlap=1) == [[0, 1, 2], [2, 3, 4], [3, 4, 5]]


def _tiny_head(t=2):
    return Mask2FormerVideoHeadTube(
        num_things_classes=5, num_queries=8, feat_channels=32, out_channels=32,
        num_decoder_layers=3, num_heads=4, ffn_dim=64, num_frames=t,
    )


def test_head_shapes(rng):
    t = 2
    feats = {
        "res2": jnp.asarray(rng.randn(2 * t, 16, 16, 64).astype(np.float32)),
        "res3": jnp.asarray(rng.randn(2 * t, 8, 8, 64).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(2 * t, 4, 4, 128).astype(np.float32)),
        "res5": jnp.asarray(rng.randn(2 * t, 2, 2, 256).astype(np.float32)),
    }
    head = _tiny_head(t)
    vs = head.init(jax.random.PRNGKey(0), feats, train=False)
    out = head.apply(vs, feats, train=False, return_query=True)
    assert len(out["cls_preds"]) == 4  # init + 3 layers
    assert out["cls_preds"][-1].shape == (2, 8, 6)
    assert out["mask_preds"][-1].shape == (2, t, 8, 16, 16)
    assert out["query"].shape == (2, 8, 32)


def test_criterion(rng):
    t = 2
    b, q, h, w, m = 2, 8, 16, 16, 3
    outputs = {
        "cls_preds": [jnp.asarray(rng.randn(b, q, 6).astype(np.float32))] * 2,
        "mask_preds": [jnp.asarray(rng.randn(b, t, q, h, w).astype(np.float32))] * 2,
    }
    targets = {
        "labels": jnp.asarray(rng.randint(0, 5, (b, m))),
        "masks": jnp.asarray((rng.rand(b, m, t, h, w) > 0.6).astype(np.float32)),
        "valid": jnp.ones((b, m), bool),
    }
    crit = TubeLinkCriterion(num_things=5, num_points=64, match_points=64)
    losses = jax.jit(lambda r, o, tg: crit(r, o, tg))(
        jax.random.PRNGKey(0), outputs, targets
    )
    assert {"loss_cls", "loss_mask", "loss_dice"} <= set(losses)
    assert "d0.loss_cls" in losses
    for v in losses.values():
        assert np.isfinite(float(v))

    def f(mask):
        o = dict(outputs, mask_preds=[mask, outputs["mask_preds"][1]])
        return crit.total(crit(jax.random.PRNGKey(0), o, targets))

    g = jax.grad(f)(outputs["mask_preds"][0])
    assert np.abs(np.asarray(g)).sum() > 0


def test_detector_whole_video(rng):
    t = 2
    module = TubeLinkVIS(
        backbone=ResNet(depth=18, out_features=("res2", "res3", "res4", "res5")),
        num_things_classes=5, num_queries=8, num_frames=t,
    )
    # build with tiny head dims via monkey config? use defaults (heavier) on
    # very small input instead
    images = jnp.zeros((t, 32, 48, 3), jnp.float32)
    vs = module.init(jax.random.PRNGKey(0), images, train=False, return_query=True)
    pipeline = TubeLinkVISInference(module, vs, clip_len=t, topk=6)
    frames = rng.randn(5, 32, 48, 3).astype(np.float32)
    out = pipeline.run_video(frames)
    assert out["masks"].shape[0] == 6
    assert out["masks"].shape[1] == 5
    assert out["labels"].shape == (6,)
    assert np.all(out["scores"][:-1] >= out["scores"][1:])

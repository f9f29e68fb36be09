"""Loss stack tests: Hungarian assignment vs scipy, loss terms vs torch
formula oracles, end-to-end criterion sanity."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF
from scipy.optimize import linear_sum_assignment

from axial_vs_tpu.ops.hungarian import hungarian_assign
from axial_vs_tpu.losses.matcher import hungarian_match, compute_mask_similarity
from axial_vs_tpu.losses.criterion import (
    SetCriterion, focal_cross_entropy_loss, softmax_ce_loss, dice_loss, process_gt,
)
from axial_vs_tpu.losses.matcher import MatchResult


def test_hungarian_assign_matches_scipy(rng):
    b, n, m = 3, 10, 6
    cost = rng.randn(b, n, m).astype(np.float32)
    valid = np.ones((b, m), bool)
    valid[1, 4:] = False
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(valid)))
    for i in range(b):
        cols = np.flatnonzero(valid[i])
        r, c = linear_sum_assignment(cost[i][:, cols])
        expect = np.full(m, -1)
        expect[cols[c]] = r
        np.testing.assert_array_equal(out[i], expect)


def test_matcher_prefers_matching_masks(rng):
    b, n, m, s = 1, 4, 2, 64
    # two gt masks; make query 2 predict gt 0 and query 0 predict gt 1
    gt = np.zeros((b, m, s), np.float32)
    gt[0, 0, :24] = 1
    gt[0, 1, 40:] = 1
    logits = np.full((b, n, s), -5.0, np.float32)
    logits[0, 2, :24] = 5.0
    logits[0, 0, 40:] = 5.0
    cls_logits = rng.randn(b, n, 4).astype(np.float32) * 0.1
    labels = np.array([[1, 2]], np.int64)
    cls_logits[0, 2, 1] = 3.0
    cls_logits[0, 0, 2] = 3.0
    outputs = {
        "pred_logits": jnp.asarray(cls_logits),
        "pred_masks": jnp.asarray(np.moveaxis(logits, 1, -1).reshape(b, 8, 8, n)),
    }
    targets = {
        "labels": jnp.asarray(labels),
        "masks": jnp.asarray(gt.reshape(b, m, 8, 8)),
        "valid": jnp.ones((b, m), bool),
    }
    res = hungarian_match(outputs, targets)
    np.testing.assert_array_equal(np.asarray(res.assignment)[0], [2, 0])
    assert float(res.matched_dice[0, 0]) > 0.5


def test_focal_ce_matches_torch(rng):
    b, n, c = 2, 6, 5
    pred = rng.randn(b, n, c).astype(np.float32)
    gt = rng.randint(0, c, (b, n))
    w = rng.rand(b, n).astype(np.float32)
    got = float(focal_cross_entropy_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(w)))

    # torch formula (reference criterion.py:17-50 semantics)
    p = torch.from_numpy(pred).transpose(1, 2)  # B C N
    onehot = TF.one_hot(torch.from_numpy(gt), c).transpose(1, 2).float()
    loss = TF.cross_entropy(p, onehot, reduction="none")
    alpha = 0.75
    aw = alpha * (1 - onehot[:, -1]) + (1 - alpha) * onehot[:, -1]
    loss = aw * loss * torch.from_numpy(w)
    nz = (loss != 0).float().sum(-1).clamp(min=1)
    expect = float((loss.sum(-1) / nz).mean())
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_softmax_ce_and_dice_match_torch(rng):
    b, n, s = 2, 5, 48
    logits = rng.randn(b, n, s).astype(np.float32)
    target = (rng.rand(b, n, s) > 0.7).astype(np.float32)
    void = (target.sum(1) < 1)
    clsw = rng.rand(b, n).astype(np.float32)

    got_ce = float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(void)))
    got_dice = float(dice_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(void), jnp.asarray(clsw)))

    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(target)
    tv = torch.from_numpy(void)
    ce = TF.cross_entropy(tl, tt, reduction="none").masked_fill(tv, 0)
    nz = (ce != 0).float().sum(-1).clamp(min=1)
    expect_ce = float((ce.sum(-1) / nz).mean())
    np.testing.assert_allclose(got_ce, expect_ce, rtol=1e-5)

    prob = tl.softmax(1).masked_fill(tv.unsqueeze(1), 0)
    smooth = 1.0
    inter = 2 * (prob * tt).sum(-1) + smooth
    den = prob.sum(-1) + tt.sum(-1) + smooth
    d = (1 - inter / den) * torch.from_numpy(clsw)
    expect_dice = float((d.sum(1) * 0.75 / n).mean())
    np.testing.assert_allclose(got_dice, expect_dice, rtol=1e-5)


def _toy_outputs_targets(rng, b=2, n=8, m=4, h=8, w=8, c=6):
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, n, c + 1).astype(np.float32)),
        "pred_masks": jnp.asarray(rng.randn(b, h, w, n).astype(np.float32)),
        "pixel_feature": jnp.asarray(rng.randn(b, h, w, 16).astype(np.float32)),
        "aux_semantic_pred": jnp.asarray(rng.randn(b, h, w, c + 1).astype(np.float32)),
        "aux_outputs": [
            {
                "pred_logits": jnp.asarray(rng.randn(b, n, c + 1).astype(np.float32)),
                "pred_masks": jnp.asarray(rng.randn(b, h, w, n).astype(np.float32)),
                "pixel_feature": jnp.asarray(rng.randn(b, h, w, 16).astype(np.float32)),
            }
        ],
    }
    masks = np.zeros((b, m, h, w), np.float32)
    for i in range(b):
        for j in range(m):
            y0, x0 = rng.randint(0, h - 2), rng.randint(0, w - 2)
            masks[i, j, y0 : y0 + 3, x0 : x0 + 3] = 1
    valid = np.ones((b, m), bool)
    valid[0, -1] = False
    targets = {
        "labels": jnp.asarray(rng.randint(0, c, (b, m))),
        "masks": jnp.asarray(masks),
        "valid": jnp.asarray(valid),
        "semantic_masks": jnp.asarray(rng.randint(-1, c, (b, h, w))),
    }
    return outputs, targets


def test_criterion_end_to_end(rng):
    outputs, targets = _toy_outputs_targets(rng)
    crit = SetCriterion(num_classes=6, pixel_insdis_sample_k=16, aux_semantic_sample_k=16)
    losses = jax.jit(lambda r, o, t: crit(r, o, t))(jax.random.PRNGKey(0), outputs, targets)
    for name in ["loss_ce", "loss_mask", "loss_dice", "loss_pixel_insdis",
                 "loss_aux_semantic", "loss_ce_0", "loss_mask_0", "loss_dice_0"]:
        assert name in losses, name
        v = float(losses[name])
        assert np.isfinite(v) and v >= 0, (name, v)
    assert "loss_aux_semantic_0" not in losses

    weights = {"loss_ce": 3.0, "loss_mask": 0.3, "loss_dice": 3.0,
               "loss_pixel_insdis": 1.0, "loss_aux_semantic": 1.0}
    crit.weights = weights
    total = crit.weighted_total(losses)
    assert np.isfinite(float(total))


def test_criterion_grads_flow(rng):
    outputs, targets = _toy_outputs_targets(rng)
    crit = SetCriterion(
        num_classes=6,
        weights={"loss_ce": 3.0, "loss_mask": 0.3, "loss_dice": 3.0,
                 "loss_pixel_insdis": 1.0, "loss_aux_semantic": 1.0},
        pixel_insdis_sample_k=16, aux_semantic_sample_k=16,
    )

    def f(pred_masks):
        o = dict(outputs, pred_masks=pred_masks)
        losses = crit(jax.random.PRNGKey(0), o, targets)
        return crit.weighted_total(losses)

    g = jax.grad(f)(outputs["pred_masks"])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

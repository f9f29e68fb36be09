"""Hungarian matcher: PQ-style similarity cost, batched and jit-able.

Re-designs `kmax_deeplab/modeling/matcher.py:18-131` (+ the video variant
`maxtron_deeplab/modeling/matcher.py` which only flattens T into the pixel
axis): cost = -(mask dice-similarity x class probability), void pixels
masked out of the prediction before the dice; the matched dice / class-prob
values are returned as the PQ-loss weights.

Batched: no python loop over the batch — everything is one einsum; only the
LSAP itself goes through ``ops.hungarian``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.hungarian import hungarian_assign


class MatchResult(NamedTuple):
    assignment: jnp.ndarray        # (B, M) int32: query index per GT (-1 invalid)
    matched_dice: jnp.ndarray      # (B, M) float32 (0 for invalid)
    matched_cls_prob: jnp.ndarray  # (B, M) float32 (0 for invalid)


def compute_mask_similarity(pred_masks, gt_masks, masking_void_pixel=True):
    """Dice-style similarity (B, N, M).

    pred_masks: (B, N, S) raw logits (S = all pixels, T folded in);
    gt_masks: (B, M, S) binary.
    """
    eps = 1e-5
    prob = jax.nn.softmax(pred_masks.astype(jnp.float32), axis=1)  # over slots
    non_void = (jnp.sum(gt_masks, axis=1, keepdims=True) > 0).astype(prob.dtype)
    if masking_void_pixel:
        prob = prob * non_void
    intersection = jnp.einsum("bns,bms->bnm", prob, gt_masks.astype(prob.dtype))
    denom = (
        jnp.sum(prob, axis=-1)[:, :, None] + jnp.sum(gt_masks, axis=-1)[:, None, :]
    ) / 2.0
    return intersection / (denom + eps)


def compute_class_similarity(pred_logits, gt_labels):
    """(B, N, M): predicted probability of each GT's class (void excluded)."""
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[..., :-1]
    return jnp.take_along_axis(
        prob, jnp.clip(gt_labels, 0, prob.shape[-1] - 1)[:, None, :], axis=-1
    )


def hungarian_match(outputs, targets, masking_void_pixel=True, exact=True):
    """Args:
      outputs: dict with 'pred_logits' (B, N, C+1), 'pred_masks'
        (B, [T,] H, W, N) or (B, N, S).
      targets: dict with 'labels' (B, M), 'masks' (B, M, [T,] H, W) binary,
        'valid' (B, M) bool.
    """
    pred_logits = outputs["pred_logits"]
    pred_masks = outputs["pred_masks"]
    b, n = pred_logits.shape[:2]
    if pred_masks.ndim > 3 or pred_masks.shape[1] != n:
        # channels-last (..., N) -> (B, N, S)
        pred_masks = jnp.moveaxis(pred_masks, -1, 1).reshape(b, n, -1)
    gt_masks = targets["masks"].reshape(b, targets["masks"].shape[1], -1)
    valid = targets["valid"]

    # matching is a no-grad zone (ref matcher.py:17,43,68)
    class_sim = jax.lax.stop_gradient(
        compute_class_similarity(pred_logits, targets["labels"])
    )
    mask_sim = jax.lax.stop_gradient(
        compute_mask_similarity(pred_masks, gt_masks, masking_void_pixel)
    )
    cost = -(mask_sim * class_sim)
    cost = jnp.where(valid[:, None, :], cost, 0.0)

    assignment = hungarian_assign(cost, valid, exact=exact)
    safe = jnp.clip(assignment, 0)
    matched_dice = jnp.where(valid, _gather_matched(mask_sim, safe), 0.0)
    matched_cls = jnp.where(valid, _gather_matched(class_sim, safe), 0.0)
    return MatchResult(assignment, matched_dice, matched_cls)


def _gather_matched(sim, assignment):
    """sim (B, N, M), assignment (B, M) -> (B, M): sim[b, assignment[b,j], j]."""
    b, n, m = sim.shape
    return sim[
        jnp.arange(b)[:, None], assignment, jnp.arange(m)[None, :]
    ]

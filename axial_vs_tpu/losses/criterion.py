"""PQ-style set criterion, jit-able and shape-polymorphic (image & video).

Re-designs `kmax_deeplab/modeling/criterion.py:12-451` and the T-aware
variants `maxtron_deeplab/modeling/{wc_criterion,cc_criterion}.py` as pure
functions over padded, statically-shaped targets:

- class loss: focal CE (alpha=.75, gamma=0) weighted per-slot by matched
  mask dice (``pq_loss_class_weight``);
- mask losses: softmax-CE **over the mask-slot dimension** + dice
  (x matched class prob), void pixels masked;
- pixel-wise instance discrimination: Gumbel-top-k sampled contrastive loss
  at tau=0.3, sampling by inverse GT-mask area;
- aux semantic CE over Gumbel-sampled pixels;
- ``process_gt`` scatters matched GT into the N query slots, gives unmatched
  slots void class with weight clamp(IoU-with-void, eos_coef), and builds the
  void mask / inverse-area maps.

Targets are padded to a fixed number of GT slots M with a validity mask;
every op is batched (no per-sample python loops).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .matcher import hungarian_match

_MASKING_CONSTANT = -99999.0


def _divide_no_nan(x, y):
    r = x / y
    return jnp.where(jnp.isfinite(r), r, 0.0)


def _mean_over_nonzero(loss_per_elem):
    """sum over last axis / count of non-zeros (>=1), then mean over batch."""
    num_non_zero = jnp.maximum(jnp.sum((loss_per_elem != 0.0), axis=-1), 1.0)
    return jnp.mean(_divide_no_nan(jnp.sum(loss_per_elem, axis=-1), num_non_zero))


def focal_cross_entropy_loss(pred, gt, weight, focal_alpha=0.75, focal_gamma=0.0):
    """pred (B, N, C); gt (B, N) int; weight (B, N)."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(gt, pred.shape[-1], dtype=jnp.float32)
    loss = -jnp.sum(onehot * logp, axis=-1)  # (B, N)
    if focal_gamma != 0.0:
        pt = jnp.sum(jax.nn.softmax(pred, axis=-1) * onehot, axis=-1)
        loss = ((1.0 - pt) ** focal_gamma) * loss
    if focal_alpha >= 0:
        is_void = onehot[..., -1]
        alpha_w = focal_alpha * (1.0 - is_void) + (1 - focal_alpha) * is_void
        loss = alpha_w * loss
    loss = loss * weight
    return _mean_over_nonzero(loss)


def softmax_ce_loss(mask_logits, target_masks, pixel_gt_void_mask):
    """CE over the mask-slot dim. mask_logits/target (B, N, S); void (B, S)."""
    logp = jax.nn.log_softmax(mask_logits.astype(jnp.float32), axis=1)
    loss = -jnp.sum(target_masks * logp, axis=1)  # (B, S)
    loss = jnp.where(pixel_gt_void_mask, 0.0, loss)
    return _mean_over_nonzero(loss)


def dice_loss(mask_logits, target_masks, pixel_gt_void_mask, matched_cls_prob,
              masking_void_pixel=True):
    """(B, N, S) inputs; returns scalar: (1 - dice) x cls_prob, x 0.75/N."""
    prob = jax.nn.softmax(mask_logits.astype(jnp.float32), axis=1)
    if masking_void_pixel:
        prob = jnp.where(pixel_gt_void_mask[:, None, :], 0.0, prob)
    smooth = 1.0
    intersection = 2 * jnp.sum(prob * target_masks, axis=-1) + smooth
    denom = jnp.sum(prob, axis=-1) + jnp.sum(target_masks, axis=-1) + smooth
    loss = (1.0 - _divide_no_nan(intersection, denom)) * matched_cls_prob
    n = mask_logits.shape[1]
    return jnp.mean(jnp.sum(loss, axis=1) * 0.75 / n)


def _gumbel_topk(rng, logits, k):
    u = jax.random.uniform(rng, logits.shape, jnp.float32, 1e-20, 1.0)
    gumbel = -jnp.log(-jnp.log(u))
    _, idx = jax.lax.top_k(logits + gumbel, k)
    return idx


def pixelwise_insdis_loss(rng, pixel_feature, gt_masks, pixel_gt_void_mask,
                          inverse_gt_mask_area, sample_temperature=1.5,
                          sample_k=4096, insdis_temperature=0.3):
    """pixel_feature (B, S, C); gt_masks (B, N, S)."""
    logits = jnp.log(inverse_gt_mask_area) * sample_temperature
    logits = logits + pixel_gt_void_mask.astype(jnp.float32) * _MASKING_CONSTANT
    # tiny inputs (tests/smoke configs) can have fewer than sample_k pixels
    idx = _gumbel_topk(rng, logits, min(sample_k, logits.shape[-1]))  # (B, K)

    gt_s = jnp.take_along_axis(gt_masks, idx[:, None, :], axis=2)  # (B, N, K)
    gt_sim = jnp.einsum("bnk,bnj->bkj", gt_s, gt_s)
    norm = jnp.sum(gt_sim, axis=1, keepdims=True)
    gt_sim = gt_sim / jnp.maximum(norm, 1.0)

    feat_s = jnp.take_along_axis(
        pixel_feature.astype(jnp.float32), idx[:, :, None], axis=1
    )  # (B, K, C)
    pred_sim = jnp.einsum("bkc,bjc->bkj", feat_s, feat_s) / insdis_temperature
    logp = jax.nn.log_softmax(pred_sim, axis=1)
    loss = -jnp.sum(gt_sim * logp, axis=1)  # (B, K)
    return _mean_over_nonzero(loss)


def aux_semantic_loss(rng, pred_logits, gt_semantic, pixel_gt_void_mask,
                      inverse_gt_mask_area, num_classes, sample_temperature=2.0,
                      sample_k=4096):
    """pred_logits (B, S, C+1); gt_semantic (B, S) with ignore=num_classes."""
    if sample_k and sample_k > 0:
        logits = jnp.log(inverse_gt_mask_area) * sample_temperature
        logits = logits + pixel_gt_void_mask.astype(jnp.float32) * _MASKING_CONSTANT
        idx = _gumbel_topk(rng, logits, min(sample_k, logits.shape[-1]))
        gt_s = jnp.take_along_axis(gt_semantic, idx, axis=1)
        pred_s = jnp.take_along_axis(pred_logits, idx[:, :, None], axis=1)
    else:
        gt_s, pred_s = gt_semantic, pred_logits
    keep = gt_s != num_classes
    logp = jax.nn.log_softmax(pred_s.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, jnp.clip(gt_s, 0, num_classes)[..., None], axis=-1)[..., 0]
    loss = jnp.where(keep, loss, 0.0)
    return _mean_over_nonzero(loss)


def process_gt(outputs, targets, match, num_classes, eos_coef=1e-5):
    """Scatter matched GT into N query slots (ref `criterion.py:328-406`)."""
    pred_masks = outputs["pred_masks"]  # (B, ..., N) channels-last
    b = pred_masks.shape[0]
    n = pred_masks.shape[-1]
    s = 1
    for d in pred_masks.shape[1:-1]:
        s *= d
    pred_masks_bns = jnp.moveaxis(pred_masks, -1, 1).reshape(b, n, s)

    gt_masks = targets["masks"].reshape(b, targets["masks"].shape[1], s)
    gt_labels = targets["labels"]
    valid = targets["valid"]
    assignment = jnp.clip(match.assignment, 0)  # (B, M)

    # scatter GT masks/labels to assigned slots
    tgt_masks = jnp.zeros((b, n, s), jnp.float32)
    batch_idx = jnp.arange(b)[:, None]
    scatter_mask = valid
    tgt_masks = tgt_masks.at[batch_idx, assignment].add(
        jnp.where(scatter_mask[:, :, None], gt_masks.astype(jnp.float32), 0.0)
    )
    # invalid columns are routed to out-of-bounds index n and dropped
    tgt_classes = jnp.full((b, n), num_classes, jnp.int32).at[
        batch_idx, jnp.where(scatter_mask, assignment, n)
    ].set(gt_labels.astype(jnp.int32), mode="drop")

    # per-slot PQ weights
    cls_w = jnp.zeros((b, n), jnp.float32).at[
        batch_idx, jnp.where(scatter_mask, assignment, n)
    ].set(jnp.maximum(match.matched_cls_prob, eos_coef), mode="drop")

    pixel_gt_void = jnp.sum(tgt_masks, axis=1) < 1  # (B, S)

    mask_gt_area = jnp.sum(tgt_masks, axis=2)  # (B, N)
    pixel_gt_area = jnp.einsum("bns,bn->bs", tgt_masks, mask_gt_area)
    inverse_area = s / jnp.maximum(pixel_gt_area, 1.0)

    # unmatched slots: dice weight = IoU with the void region (no-grad, the
    # whole process_gt is a no-grad zone in the reference, criterion.py:328)
    prob = jax.lax.stop_gradient(
        jax.nn.softmax(pred_masks_bns.astype(jnp.float32), axis=1)
    )
    void_iou = jnp.einsum("bns,bs->bn", prob, pixel_gt_void.astype(jnp.float32)) / (
        jnp.sum(prob, axis=-1) + 1e-5
    )
    dice_w = void_iou.at[batch_idx, jnp.where(scatter_mask, assignment, n)].set(
        match.matched_dice, mode="drop"
    )
    dice_w = jnp.maximum(dice_w, eos_coef)

    out = {
        "masks": tgt_masks,
        "labels": tgt_classes,
        "pq_loss_mask_weight": cls_w,
        "pq_loss_class_weight": dice_w,
        "pixel_gt_void_mask": pixel_gt_void,
        "inverse_gt_mask_area": inverse_area,
        "pred_masks_bns": pred_masks_bns,
    }
    if "semantic_masks" in targets:
        sem = targets["semantic_masks"].reshape(b, -1)
        sem = jnp.where(sem == -1, num_classes, sem)
        out["ground_truth_semantic"] = sem
    return out


class SetCriterion:
    """Callable bundle of the PQ losses (weights resolved by the caller)."""

    def __init__(self, num_classes, weights=None, eos_coef=1e-5,
                 share_final_matching=True, pixel_insdis_temperature=1.5,
                 pixel_insdis_sample_k=4096, aux_semantic_temperature=2.0,
                 aux_semantic_sample_k=4096, masking_void_pixel=True,
                 losses=("labels", "masks", "pixels", "aux_semantic"),
                 exact_matching=True):
        self.num_classes = num_classes
        self.weights = weights or {}
        self.eos_coef = eos_coef
        self.share_final_matching = share_final_matching
        self.pixel_insdis_temperature = pixel_insdis_temperature
        self.pixel_insdis_sample_k = pixel_insdis_sample_k
        self.aux_semantic_temperature = aux_semantic_temperature
        self.aux_semantic_sample_k = aux_semantic_sample_k
        self.masking_void_pixel = masking_void_pixel
        self.losses = losses
        self.exact_matching = exact_matching

    def _losses_for(self, rng, outputs, processed, with_semantic):
        out = {}
        if "labels" in self.losses:
            out["loss_ce"] = focal_cross_entropy_loss(
                outputs["pred_logits"], processed["labels"],
                processed["pq_loss_class_weight"],
            )
        if "masks" in self.losses:
            out["loss_mask"] = softmax_ce_loss(
                processed["pred_masks_bns"], processed["masks"],
                processed["pixel_gt_void_mask"],
            )
            out["loss_dice"] = dice_loss(
                processed["pred_masks_bns"], processed["masks"],
                processed["pixel_gt_void_mask"], processed["pq_loss_mask_weight"],
                self.masking_void_pixel,
            )
        if "pixels" in self.losses and "pixel_feature" in outputs:
            b = outputs["pixel_feature"].shape[0]
            c = outputs["pixel_feature"].shape[-1]
            rng, sub = jax.random.split(rng)
            out["loss_pixel_insdis"] = pixelwise_insdis_loss(
                sub,
                outputs["pixel_feature"].reshape(b, -1, c),
                processed["masks"],
                processed["pixel_gt_void_mask"],
                processed["inverse_gt_mask_area"],
                self.pixel_insdis_temperature,
                self.pixel_insdis_sample_k,
            )
        if (
            with_semantic
            and "aux_semantic" in self.losses
            and "aux_semantic_pred" in outputs
            and "ground_truth_semantic" in processed
        ):
            b = outputs["aux_semantic_pred"].shape[0]
            cp1 = outputs["aux_semantic_pred"].shape[-1]
            rng, sub = jax.random.split(rng)
            out["loss_aux_semantic"] = aux_semantic_loss(
                sub,
                outputs["aux_semantic_pred"].reshape(b, -1, cp1),
                processed["ground_truth_semantic"],
                processed["pixel_gt_void_mask"],
                processed["inverse_gt_mask_area"],
                self.num_classes,
                self.aux_semantic_temperature,
                self.aux_semantic_sample_k,
            )
        return out

    def __call__(self, rng, outputs, targets):
        """outputs: model dict; targets: padded dict (see matcher). Returns
        {loss_name: scalar} with aux-layer losses suffixed ``_i``.

        Mappers build OS4 targets at ceil(size/4) (the reference's
        ``prepare_targets``, `maxtron_wc_model.py:403-404`); VALID-stem
        backbones (ConvNeXt, `convnext.py:106-108` reference) predict on
        the floor(size/4) grid at non-multiple-of-4 inputs. The reference
        only ever trains such backbones on 4-multiple crops; we crop the
        trailing GT row/col (pad region of the ceil grid) so either crop
        size works with either backbone."""
        gt_sp = targets["masks"].shape[2:]
        pr_sp = outputs["pred_masks"].shape[1:-1]
        if len(gt_sp) == len(pr_sp) and gt_sp != pr_sp and all(
            0 <= g - p <= 1 for g, p in zip(gt_sp, pr_sp)
        ):
            sl = (slice(None), slice(None)) + tuple(slice(0, p) for p in pr_sp)
            targets = dict(targets, masks=targets["masks"][sl])
            if "semantic_masks" in targets:
                sem = targets["semantic_masks"]  # (..., H, W)
                targets["semantic_masks"] = sem[
                    (slice(None),) * (sem.ndim - 2)
                    + (slice(0, pr_sp[-2]), slice(0, pr_sp[-1]))]
        match = hungarian_match(
            outputs, targets, self.masking_void_pixel, exact=self.exact_matching
        )
        processed = process_gt(outputs, targets, match, self.num_classes, self.eos_coef)
        rng, sub = jax.random.split(rng)
        losses = self._losses_for(sub, outputs, processed, with_semantic=True)

        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            if not self.share_final_matching:
                match = hungarian_match(
                    aux, targets, self.masking_void_pixel, exact=self.exact_matching
                )
            processed_aux = process_gt(
                aux, targets, match, self.num_classes, self.eos_coef
            )
            # GT semantic only used on the final output (ref :433-435)
            rng, sub = jax.random.split(rng)
            aux_losses = self._losses_for(sub, aux, processed_aux, with_semantic=False)
            losses.update({f"{k}_{i}": v for k, v in aux_losses.items()})
        return losses

    def weighted_total(self, losses):
        total = 0.0
        for k, v in losses.items():
            base = k.rsplit("_", 1)[0] if k[-1].isdigit() else k
            if base in self.weights:
                total = total + self.weights[base] * v
        return total

"""Panoptic / semantic / instance inference, fully jit-able.

Re-designs the reference's sequential, dict-driven post-processing
(`kmax_deeplab/kmax_model.py:355-465` and the video variant
`maxtron_deeplab/maxtron_wc_model.py:440-551`) as vectorized ``lax.scan``
programs with static shapes: slots are visited in reorder-score order; the
carry holds the claimed-pixel map, the running segment counter and a
per-class stuff-segment table — bit-exact with the reference's loop
semantics (confidence gate, overlap gate, stuff merge).

Outputs are arrays, not python dicts: per-slot ``segment_valid/id/category/
isthing`` plus the (T,)H,W panoptic id map; host-side evaluators assemble
whatever dict format they need from these.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PanopticOutput(NamedTuple):
    panoptic_seg: jnp.ndarray      # (..., H, W) int32, 0 = void/unassigned
    segment_valid: jnp.ndarray     # (N,) bool — slot opened a NEW segment
    segment_id: jnp.ndarray        # (N,) int32 — its id (0 if not valid)
    segment_category: jnp.ndarray  # (N,) int32 — contiguous class label
    segment_isthing: jnp.ndarray   # (N,) bool
    slot_index: jnp.ndarray        # (N,) int32 — original mask-slot index
    accepted: jnp.ndarray          # (N,) bool — slot contributed pixels


def panoptic_inference(
    mask_cls,
    mask_pred,
    thing_class_mask,
    pixel_confidence_threshold: float = 0.4,
    class_threshold_thing: float = 0.7,
    class_threshold_stuff: float = 0.5,
    overlap_threshold: float = 0.8,
    reorder_class_weight: float = 1.0,
    reorder_mask_weight: float = 1.0,
):
    """Vectorized kMaX panoptic post-processing.

    Args:
      mask_cls: (N, C+1) class logits (last = void).
      mask_pred: (..., H, W, N) mask logits — leading dims (e.g. T) allowed;
        the softmax over slots and all gates work on the full (...,H,W) tube.
      thing_class_mask: (C,) bool — True for thing classes.
    Returns: PanopticOutput (slot arrays follow visit order).
    """
    n = mask_pred.shape[-1]
    cls_prob = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[..., :-1]
    cls_scores = jnp.max(cls_prob, axis=-1)
    cls_labels = jnp.argmax(cls_prob, axis=-1).astype(jnp.int32)

    mask_scores = jax.nn.softmax(mask_pred.astype(jnp.float32), axis=-1)
    binary_masks = mask_scores > pixel_confidence_threshold  # (..., H, W, N)
    pixel_count = jnp.sum(binary_masks, axis=tuple(range(binary_masks.ndim - 1)))
    mask_conf = jnp.sum(
        mask_scores * binary_masks, axis=tuple(range(binary_masks.ndim - 1))
    ) / jnp.maximum(pixel_count, 1.0)

    reorder_score = (cls_scores ** reorder_class_weight) * (
        mask_conf ** reorder_mask_weight
    )
    order = jnp.argsort(-reorder_score)

    is_thing = thing_class_mask[cls_labels]  # (N,)
    confident = jnp.where(
        is_thing, cls_scores > class_threshold_thing, cls_scores > class_threshold_stuff
    )

    num_classes = thing_class_mask.shape[0]
    spatial_shape = mask_pred.shape[:-1]
    # move the slot axis first for the scan
    binary_by_slot = jnp.moveaxis(binary_masks, -1, 0)  # (N, ..., H, W)

    def step(carry, slot):
        panoptic, seg_counter, stuff_table = carry
        cur_mask = binary_by_slot[slot]
        label = cls_labels[slot]
        thing = is_thing[slot]
        conf = confident[slot]

        new_mask = jnp.logical_and(cur_mask, panoptic == 0)
        orig_n = jnp.sum(cur_mask.astype(jnp.float32))
        new_n = jnp.sum(new_mask.astype(jnp.float32))
        not_overlap = new_n > orig_n * overlap_threshold
        accept = jnp.logical_and(conf, not_overlap)

        stuff_prev = stuff_table[label]
        merge_stuff = jnp.logical_and(accept, jnp.logical_and(~thing, stuff_prev > 0))
        new_segment = jnp.logical_and(accept, ~merge_stuff)

        next_counter = seg_counter + new_segment.astype(jnp.int32)
        assigned_id = jnp.where(merge_stuff, stuff_prev, next_counter)
        panoptic = jnp.where(
            jnp.logical_and(new_mask, accept), assigned_id, panoptic
        )
        stuff_table = stuff_table.at[label].set(
            jnp.where(
                jnp.logical_and(new_segment, ~thing), next_counter, stuff_prev
            )
        )
        out = (
            new_segment,
            jnp.where(new_segment, next_counter, 0),
            label,
            thing,
            slot,
            accept,
        )
        return (panoptic, next_counter, stuff_table), out

    init = (
        jnp.zeros(spatial_shape, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.zeros((num_classes,), jnp.int32),
    )
    (panoptic, _, _), outs = jax.lax.scan(step, init, order)
    seg_valid, seg_id, seg_cat, seg_thing, slot_idx, accepted = outs
    return PanopticOutput(
        panoptic_seg=panoptic,
        segment_valid=seg_valid,
        segment_id=seg_id.astype(jnp.int32),
        segment_category=seg_cat,
        segment_isthing=seg_thing,
        slot_index=slot_idx.astype(jnp.int32),
        accepted=accepted,
    )


def remap_panoptic_to_dataset_ids(
    result: PanopticOutput,
    contiguous_to_dataset_id,
    label_divisor: int,
):
    """Map internal segment ids to dataset panoptic ids (video evaluator
    format, ref `maxtron_wc_model.py:539-551`): things get
    ``cat_id * label_divisor + instance_index`` (instance_index counts
    accepted things of that category in acceptance order), stuff gets
    ``cat_id``; unassigned pixels get -1.

    Returns (panoptic_ids (...,H,W) int32, per-segment new ids (N,) int32).
    """
    n = result.segment_valid.shape[0]
    cat_dataset = contiguous_to_dataset_id[result.segment_category]
    valid_thing = jnp.logical_and(result.segment_valid, result.segment_isthing)
    # instance index within category = number of earlier accepted things of
    # the same category (scan order == acceptance order)
    same_cat = result.segment_category[None, :] == result.segment_category[:, None]
    earlier = jnp.tril(jnp.ones((n, n), bool), k=-1)
    inst_idx = jnp.sum(
        same_cat & earlier & valid_thing[None, :], axis=1
    ).astype(jnp.int32)
    new_ids = jnp.where(
        valid_thing,
        cat_dataset * label_divisor + inst_idx,
        jnp.where(result.segment_valid, cat_dataset, 0),
    ).astype(jnp.int32)

    # lookup table over segment ids (1..N); 0 -> -1 (void)
    table = jnp.full((n + 1,), -1, jnp.int32)
    table = table.at[jnp.where(result.segment_valid, result.segment_id, 0)].set(
        jnp.where(result.segment_valid, new_ids, -1)
    )
    table = table.at[0].set(-1)
    return table[result.panoptic_seg], new_ids


def semantic_inference(mask_cls, mask_pred):
    """(C, ..., H, W)-style semantic probabilities (ref `kmax_model.py:355-361`),
    returned channels-last (..., H, W, C)."""
    cls_prob = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[..., :-1]
    mask_prob = jax.nn.softmax(mask_pred.astype(jnp.float32), axis=-1)
    return jnp.einsum("...n,nc->...c", mask_prob, cls_prob)


def instance_inference(mask_cls, mask_pred, thing_class_mask, topk: int,
                       pixel_confidence_threshold: float = 0.4):
    """Top-k instance extraction (ref `kmax_model.py:431-465`).

    Returns dict of arrays (masks as probabilities (k, ..., H, W), scores,
    classes, and thing-validity flags). Filtering to thing classes is done by
    zeroing scores (static shapes) rather than boolean indexing.
    """
    n, num_cls_p1 = mask_cls.shape
    num_classes = num_cls_p1 - 1
    mask_prob = jax.nn.softmax(mask_pred.astype(jnp.float32), axis=-1)
    scores = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[:, :-1]  # (N, C)
    flat = scores.reshape(-1)
    topk_scores, topk_indices = jax.lax.top_k(flat, topk)
    labels = topk_indices % num_classes
    slots = topk_indices // num_classes
    masks = jnp.moveaxis(mask_prob, -1, 0)[slots]  # (k, ..., H, W)
    binary = masks > pixel_confidence_threshold
    axes = tuple(range(1, masks.ndim))
    mask_score = jnp.sum(masks * binary, axis=axes) / (
        jnp.sum(binary, axis=axes) + 1e-6
    )
    return {
        "pred_masks": binary,
        "scores": topk_scores * mask_score,
        "pred_classes": labels.astype(jnp.int32),
        "is_thing": thing_class_mask[labels],
    }

"""Panoptic post-processing: scan-based jit version vs a python loop oracle.

The oracle implements the reference algorithm (`kmax_model.py:363-428`)
directly in numpy with python control flow; the scan version must match it
exactly (same ids, same pixels) on randomized inputs incl. stuff merges.
"""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.models.postprocess import (
    panoptic_inference,
    remap_panoptic_to_dataset_ids,
    semantic_inference,
    instance_inference,
)


def softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_panoptic(mask_cls, mask_pred, thing_mask, pix_th, th_thing, th_stuff,
                    overlap_th):
    # mask_cls (N, C+1); mask_pred (H, W, N)
    n = mask_pred.shape[-1]
    cls_prob = softmax(mask_cls, -1)[:, :-1]
    cls_scores = cls_prob.max(-1)
    cls_labels = cls_prob.argmax(-1)
    mask_scores = softmax(mask_pred, -1)
    binary = mask_scores > pix_th
    cnt = binary.reshape(-1, n).sum(0)
    conf = (mask_scores * binary).reshape(-1, n).sum(0) / np.maximum(cnt, 1.0)
    reorder = cls_scores * conf
    order = np.argsort(-reorder, kind="stable")

    pan = np.zeros(mask_pred.shape[:-1], np.int32)
    seg_infos = []
    cur_id = 0
    stuff_mem = {}
    for idx in order:
        m = binary[..., idx]
        score, label = cls_scores[idx], int(cls_labels[idx])
        thing = bool(thing_mask[label])
        confident = score > (th_thing if thing else th_stuff)
        new_mask = m & (pan == 0)
        if not (confident and new_mask.sum() > m.sum() * overlap_th):
            continue
        if not thing and label in stuff_mem:
            pan[new_mask] = stuff_mem[label]
            continue
        cur_id += 1
        if not thing:
            stuff_mem[label] = cur_id
        pan[new_mask] = cur_id
        seg_infos.append({"id": cur_id, "isthing": thing, "category_id": label})
    return pan, seg_infos


def _run_case(seed, shape=(13, 17), n=12, c=6):
    rng = np.random.RandomState(seed)
    mask_cls = rng.randn(n, c + 1).astype(np.float32) * 2
    mask_pred = rng.randn(*shape, n).astype(np.float32) * 3
    # smooth masks to create coherent regions
    thing_mask = np.zeros(c, bool)
    thing_mask[: c // 2] = True
    args = dict(
        pixel_confidence_threshold=0.3,
        class_threshold_thing=0.2,
        class_threshold_stuff=0.3,
        overlap_threshold=0.8,
    )
    pan_ref, infos_ref = oracle_panoptic(
        mask_cls, mask_pred, thing_mask, 0.3, 0.2, 0.3, 0.8
    )
    out = jax.jit(
        lambda mc, mp: panoptic_inference(mc, mp, jnp.asarray(thing_mask), **args)
    )(mask_cls, mask_pred)
    np.testing.assert_array_equal(np.asarray(out.panoptic_seg), pan_ref)
    got_infos = [
        {"id": int(i), "isthing": bool(t), "category_id": int(cat)}
        for v, i, t, cat in zip(
            np.asarray(out.segment_valid),
            np.asarray(out.segment_id),
            np.asarray(out.segment_isthing),
            np.asarray(out.segment_category),
        )
        if v
    ]
    assert got_infos == infos_ref
    return out, thing_mask


def test_panoptic_inference_matches_oracle():
    for seed in range(8):
        _run_case(seed)


def test_panoptic_inference_video_tube():
    rng = np.random.RandomState(3)
    n, c = 10, 5
    mask_cls = rng.randn(n, c + 1).astype(np.float32)
    mask_pred = rng.randn(2, 9, 11, n).astype(np.float32) * 2  # (T, H, W, N)
    thing_mask = np.array([True, True, False, False, False])
    out = panoptic_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), jnp.asarray(thing_mask),
        pixel_confidence_threshold=0.3, class_threshold_thing=0.2,
        class_threshold_stuff=0.3, overlap_threshold=0.8,
    )
    assert out.panoptic_seg.shape == (2, 9, 11)
    # remap to dataset ids
    cont2ds = jnp.arange(c, dtype=jnp.int32) + 100
    ids, new_ids = remap_panoptic_to_dataset_ids(out, cont2ds, label_divisor=10000)
    ids = np.asarray(ids)
    valid = np.asarray(out.segment_valid)
    segs = np.asarray(new_ids)[valid]
    # every painted pixel carries a valid dataset id; unpainted -> -1
    painted = np.asarray(out.panoptic_seg) > 0
    assert set(np.unique(ids[painted])) <= set(segs.tolist())
    assert (ids[~painted] == -1).all()
    # thing ids are cat*divisor+idx, stuff ids are plain cat
    isthing = np.asarray(out.segment_isthing)[valid]
    cats = np.asarray(out.segment_category)[valid]
    for sid, th, cat in zip(segs, isthing, cats):
        if th:
            assert sid // 10000 == cat + 100
        else:
            assert sid == cat + 100


def test_semantic_and_instance_inference():
    rng = np.random.RandomState(0)
    n, c = 8, 5
    mask_cls = rng.randn(n, c + 1).astype(np.float32)
    mask_pred = rng.randn(7, 9, n).astype(np.float32)
    sem = semantic_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    assert sem.shape == (7, 9, c)
    assert np.all(np.asarray(sem) >= 0)
    thing_mask = jnp.asarray(np.array([True, True, True, False, False]))
    inst = instance_inference(
        jnp.asarray(mask_cls), jnp.asarray(mask_pred), thing_mask, topk=6,
        pixel_confidence_threshold=0.4,
    )
    assert inst["pred_masks"].shape == (6, 7, 9)
    assert inst["scores"].shape == (6,)

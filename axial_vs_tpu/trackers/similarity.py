"""qdtrack similarity / loss utilities (host-side numpy).

Re-implements `MaXTron_Tube-Link/tracker/qdtrack/track/similarity.py` and
`tracker/qdtrack/losses/l2_loss.py` semantics for the tracker stack.
"""
from __future__ import annotations

import numpy as np


def softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.maximum(e.sum(axis=axis, keepdims=True), 1e-12)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), eps)


def cal_similarity(key_embeds, ref_embeds, method="dot_product",
                   temperature=-1.0):
    """(`similarity.py:5-26`): dot-product or cosine similarity matrix;
    dot_product with temperature>0 = cosine / temperature."""
    if key_embeds.shape[0] == 0 or ref_embeds.shape[0] == 0:
        return np.zeros((key_embeds.shape[0], ref_embeds.shape[0]), np.float32)
    if method == "cosine":
        return l2_normalize(key_embeds) @ l2_normalize(ref_embeds).T
    if method == "dot_product":
        if temperature > 0:
            return cal_similarity(key_embeds, ref_embeds, "cosine") / temperature
        return key_embeds @ ref_embeds.T
    raise ValueError(method)


def bbox_overlaps(a, b, eps=1e-6):
    """IoU matrix between xyxy boxes a (N, 4) and b (M, 4)."""
    if a.shape[0] == 0 or b.shape[0] == 0:
        return np.zeros((a.shape[0], b.shape[0]), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, eps)


def mask_iou(mask1, mask2, eps=1e-6):
    """IoU between boolean mask stacks (N, H, W) x (M?, H, W) — elementwise
    pairing when shapes match (`idol_tracker.py:14-21` pairs index-wise)."""
    m1 = mask1.astype(np.float32)
    m2 = mask2.astype(np.float32)
    inter = (m1 * m2).sum(axis=(-2, -1))
    union = (m1 + m2 - m1 * m2).sum(axis=(-2, -1))
    return (inter + eps) / (union + eps)


def l2_similarity_loss(pred, target, weight=None, neg_pos_ub=-1,
                       pos_margin=-1.0, neg_margin=-1.0, hard_mining=False,
                       rng=None):
    """qdtrack L2Loss (`losses/l2_loss.py`): squared error on a similarity
    matrix vs a 0/1 match-target matrix, with optional pos/neg margins,
    neg:pos cap (random or hard-mined negative subsampling). Returns
    (loss_mean, avg_factor_used)."""
    pred = np.array(pred, np.float32)
    target = np.array(target, np.float32)
    weight = (np.ones_like(target) if weight is None
              else np.array(weight, np.float32))
    target[weight <= 0] = -1
    pos = target == 1
    neg = target == 0
    if pos_margin > 0:
        pred[pos] -= pos_margin
    if neg_margin > 0:
        pred[neg] -= neg_margin
    pred = np.clip(pred, 0.0, 1.0)
    num_pos = int(pos.sum())
    num_neg = int(neg.sum())
    if neg_pos_ub > 0 and num_neg / (num_pos + 1) > neg_pos_ub:
        num_neg = num_pos * neg_pos_ub
        neg_idx = np.argwhere(neg)
        if hard_mining:
            costs = ((pred - target) ** 2)[neg_idx[:, 0], neg_idx[:, 1]]
            keep = np.argsort(-costs)[:num_neg]
        else:
            rng = rng or np.random.RandomState(0)
            keep = rng.permutation(len(neg_idx))[:num_neg]
        new_neg = np.zeros_like(neg)
        sel = neg_idx[keep]
        new_neg[sel[:, 0], sel[:, 1]] = True
        weight[np.logical_xor(neg, new_neg)] = 0
    avg = max(float((weight > 0).sum()), 1.0)
    loss = (((pred - target) ** 2) * weight).sum() / avg
    return loss, avg

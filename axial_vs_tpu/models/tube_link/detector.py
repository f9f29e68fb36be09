"""TubeLinkVIS: tube-based video instance segmentation detector.

Re-designs `MaXTron_Tube-Link/models/video/tube_link_vis/
mask2former_vis_tube.py:48-333`: training runs backbone + tube head over
B*T frames; testing partitions the video into tubes (`video_split` :15-45),
runs per-tube inference returning query features, Hungarian-matches queries
across consecutive tubes on cosine similarity (:149-165, 246-254), averages
class logits, concatenates tube masks, and extracts top-k instances.
"""
from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from scipy.optimize import linear_sum_assignment

from .head import Mask2FormerVideoHeadTube


def video_split(num_frames: int, clip_len: int, overlap: int = 0):
    """Tube index list covering the video (ref :15-45): windows of
    ``clip_len`` advancing by ``clip_len - overlap``; the last window is
    shifted back to end exactly at the last frame."""
    assert clip_len > overlap
    step = clip_len - overlap
    starts = list(range(0, max(num_frames - overlap, 1), step))
    tubes = []
    for s in starts:
        e = s + clip_len
        if e > num_frames:
            s, e = max(num_frames - clip_len, 0), num_frames
        tubes.append(list(range(s, e)))
        if e >= num_frames:
            break
    return tubes


class TubeLinkVIS(nn.Module):
    """backbone + Mask2Former tube head; one clip per call (B=1 video)."""

    backbone: nn.Module
    num_things_classes: int = 40
    num_queries: int = 100
    num_frames: int = 2
    use_temporal_attn: bool = True
    feat_channels: int = 256
    out_channels: int = 256
    num_decoder_layers: int = 9
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False, return_query: bool = False):
        feats = self.backbone(images, train=train)
        return Mask2FormerVideoHeadTube(
            num_things_classes=self.num_things_classes,
            num_queries=self.num_queries,
            num_frames=self.num_frames,
            use_temporal_attn=self.use_temporal_attn,
            feat_channels=self.feat_channels,
            out_channels=self.out_channels,
            num_decoder_layers=self.num_decoder_layers,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            dtype=self.dtype,
            name="head",
        )(feats, train=train, return_query=return_query)


def match_query_embeds(tgt: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """Cross-tube Hungarian on query cosine similarity (ref :149-165)."""
    cur_n = cur / np.maximum(np.linalg.norm(cur, axis=1, keepdims=True), 1e-12)
    tgt_n = tgt / np.maximum(np.linalg.norm(tgt, axis=1, keepdims=True), 1e-12)
    cost = 1 - cur_n @ tgt_n.T
    _, col = linear_sum_assignment(cost.T)
    return col


class TubeLinkVISInference:
    """Whole-video near-online inference: tubes -> linked instance masks."""

    def __init__(self, module, variables, *, clip_len, overlap=0, topk=30,
                 score_threshold=0.0):
        self.module = module
        self.variables = variables
        self.clip_len = clip_len
        self.overlap = overlap
        self.topk = topk
        self.score_threshold = score_threshold

        @jax.jit
        def tube_forward(images):
            out = module.apply(variables, images, train=False, return_query=True)
            return out["cls_preds"][-1][0], out["mask_preds"][-1][0], out["query"][0]

        self._tube_forward = tube_forward

    def run_video(self, images: np.ndarray):
        """images: (V, H, W, 3) preprocessed frames. Returns dict with
        per-instance video masks (k, V, h, w) logits, labels, scores."""
        v = images.shape[0]
        tubes = video_split(v, self.clip_len, self.overlap)

        logits_list, masks_list, queries = [], [], []
        for idx in tubes:
            clip = jnp.asarray(images[idx])
            cls_logits, masks, query = self._tube_forward(clip)
            logits_list.append(np.asarray(cls_logits))
            masks_list.append(np.asarray(masks))  # (T, Q, h, w)
            queries.append(np.asarray(query))

        perm = np.arange(queries[0].shape[0])
        perms = [perm]
        ref_query = queries[0]
        for i in range(1, len(tubes)):
            perm = match_query_embeds(ref_query, queries[i])
            perms.append(perm)
            ref_query = queries[i][perm]

        # assemble whole-video masks frame by frame (overlaps: later tube wins)
        q = queries[0].shape[0]
        h, w = masks_list[0].shape[-2:]
        video_masks = np.zeros((v, q, h, w), np.float32)
        for idx, masks, perm in zip(tubes, masks_list, perms):
            video_masks[idx] = masks[:, perm]
        avg_logits = np.mean(
            [l[p] for l, p in zip(logits_list, perms)], axis=0
        )  # (Q, K+1)

        probs = _softmax(avg_logits)[:, :-1]
        flat = probs.reshape(-1)
        k = min(self.topk, flat.size)
        top = np.argpartition(-flat, k - 1)[:k]
        top = top[np.argsort(-flat[top])]
        labels = top % probs.shape[1]
        slots = top // probs.shape[1]
        return {
            "masks": video_masks[:, slots].transpose(1, 0, 2, 3),  # (k, V, h, w)
            "labels": labels.astype(np.int64),
            "scores": flat[top],
        }


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)

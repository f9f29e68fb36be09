"""IDOL tracker (host-side numpy).

Re-implements `MaXTron_Tube-Link/tracker/qdtrack/trackers/idol_tracker.py:
47-295`: mask-logit NMS before matching, bisoftmax/softmax/cosine matching
against EMA (or long-window score-weighted) tracklet embeddings with
optional tracklet-age ("frame") weighting, three-state ids
(-2 undecided -> track id | -1 backdrop), velocity/age bookkeeping,
post-match mask-IoU gate for backdrop demotion.
"""
from __future__ import annotations

import numpy as np

from .similarity import l2_normalize, mask_iou, softmax


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def mask_nms(mask_logits, nms_thr=0.5):
    """(`idol_tracker.py:24-44`) greedy IoU suppression on sigmoid>0.5
    binarized mask logits, in detection order. Returns keep flags."""
    n = len(mask_logits)
    keep = np.ones(n, bool)
    masks = _sigmoid(np.asarray(mask_logits)) > 0.5
    for i in range(n - 1):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if keep[j] and mask_iou(masks[i], masks[j]) > nms_thr:
                keep[j] = False
    return keep


class IDOLTracker:
    def __init__(self, nms_thr_pre=0.7, nms_thr_post=0.3, init_score_thr=0.2,
                 addnew_score_thr=0.5, obj_score_thr=0.1, match_score_thr=0.5,
                 memo_tracklet_frames=10, memo_backdrop_frames=1,
                 memo_momentum=0.5, match_metric="bisoftmax",
                 long_match=False, frame_weight=False, temporal_weight=False,
                 memory_len=10):
        assert match_metric in ("bisoftmax", "softmax", "cosine")
        self.nms_thr_pre = nms_thr_pre
        self.nms_thr_post = nms_thr_post
        self.init_score_thr = init_score_thr
        self.addnew_score_thr = addnew_score_thr
        self.obj_score_thr = obj_score_thr
        self.match_score_thr = match_score_thr
        self.memo_tracklet_frames = memo_tracklet_frames
        self.memo_backdrop_frames = memo_backdrop_frames
        self.memo_momentum = memo_momentum
        self.match_metric = match_metric
        self.long_match = long_match
        self.frame_weight = frame_weight
        self.temporal_weight = temporal_weight
        self.memory_len = memory_len
        self.reset()

    def reset(self):
        self.num_tracklets = 0
        self.tracklets = {}
        self.backdrops = []

    @property
    def empty(self):
        return not self.tracklets

    def update_memo(self, ids, bboxes, embeds, labels, frame_id):
        for tid, bbox, embed, label in zip(ids, bboxes, embeds, labels):
            if tid < 0:
                continue
            tid = int(tid)
            if tid in self.tracklets:
                t = self.tracklets[tid]
                velocity = (bbox - t["bbox"]) / (frame_id - t["last_frame"])
                t["bbox"] = bbox
                t["long_score"].append(bbox[-1])
                t["embed"] = ((1 - self.memo_momentum) * t["embed"]
                              + self.memo_momentum * embed)
                t["long_embed"].append(embed)
                t["last_frame"] = frame_id
                t["label"] = label
                t["velocity"] = ((t["velocity"] * t["acc_frame"] + velocity)
                                 / (t["acc_frame"] + 1))
                t["acc_frame"] += 1
                t["exist_frame"] += 1
            else:
                self.tracklets[tid] = dict(
                    bbox=bbox, embed=embed.copy(), long_embed=[embed],
                    long_score=[bbox[-1]], label=label, last_frame=frame_id,
                    velocity=np.zeros_like(bbox), acc_frame=0, exist_frame=1)

        self.backdrops.insert(0, dict(
            bboxes=bboxes[ids == -1], embeds=embeds[ids == -1],
            labels=labels[ids == -1]))

        for tid in [k for k, v in self.tracklets.items()
                    if frame_id - v["last_frame"] >= self.memo_tracklet_frames]:
            self.tracklets.pop(tid)
        for v in self.tracklets.values():
            if len(v["long_embed"]) > self.memory_len:
                v["long_embed"].pop(0)
            if len(v["long_score"]) > self.memory_len:
                v["long_score"].pop(0)
        if len(self.backdrops) > self.memo_backdrop_frames:
            self.backdrops.pop()

    def _memo(self):
        ids, embeds, exist = [], [], []
        for k, v in self.tracklets.items():
            if self.long_match:
                weights = np.asarray(v["long_score"], np.float32)
                if self.temporal_weight:
                    n = len(weights)
                    weights = weights + np.arange(1, n + 1, dtype=np.float32) / n
                stack = np.stack(v["long_embed"])
                embeds.append((stack * weights[:, None]).sum(0) / weights.sum())
            else:
                embeds.append(v["embed"])
            ids.append(k)
            exist.append(v["exist_frame"])
        return (np.stack(embeds), np.asarray(ids, np.int64),
                np.asarray(exist, np.float32))

    def match(self, bboxes, labels, mask_logits, track_feats, frame_id):
        """bboxes (N, 5) xyxy+score; mask_logits (N, H, W); track_feats (N, E).
        Returns (bboxes, labels, ids) after pre-NMS; id -1 = backdrop."""
        bboxes = np.array(bboxes, np.float32)
        labels = np.asarray(labels)
        masks = np.asarray(mask_logits, np.float32)
        embeds = np.array(track_feats, np.float32)

        keep = mask_nms(masks, self.nms_thr_pre)
        bboxes, labels, masks, embeds = (
            bboxes[keep], labels[keep], masks[keep], embeds[keep])

        ids = np.full((len(bboxes),), -2, np.int64)
        if len(bboxes) > 0 and not self.empty:
            memo_embeds, memo_ids, memo_exist = self._memo()
            feats = embeds @ memo_embeds.T
            if self.match_metric == "bisoftmax":
                scores = (softmax(feats, 1) + softmax(feats, 0)) / 2
            elif self.match_metric == "softmax":
                scores = softmax(feats, 1)
            else:
                scores = l2_normalize(embeds) @ l2_normalize(memo_embeds).T
            for i in range(len(bboxes)):
                row = scores[i]
                if self.frame_weight:
                    non_backs = (memo_ids > -1) & (row > 0.5)
                    if non_backs.sum() > 1:
                        w = row.copy()
                        fw = memo_exist[row > 0.5]
                        w[non_backs] = w[non_backs] * fw
                        w[~non_backs] = w[~non_backs] * fw.mean()
                        memo_ind = int(w.argmax())
                        conf = w[memo_ind]  # ref compares the weighted score
                    else:
                        memo_ind = int(row.argmax())
                        conf = row[memo_ind]
                else:
                    memo_ind = int(row.argmax())
                    conf = row[memo_ind]
                if conf > self.match_score_thr and memo_ids[memo_ind] > -1:
                    ids[i] = memo_ids[memo_ind]
                    scores[:i, memo_ind] = 0
                    scores[i + 1:, memo_ind] = 0
            new = (ids == -2) & (bboxes[:, 4] > self.addnew_score_thr)
        else:
            new = (ids == -2) & (bboxes[:, 4] > self.init_score_thr)

        num_new = int(new.sum())
        ids[new] = np.arange(self.num_tracklets,
                             self.num_tracklets + num_new, dtype=np.int64)
        self.num_tracklets += num_new

        # demote leftover detections that don't overlap anything to backdrops
        unsel = np.nonzero(ids == -2)[0]
        bin_all = _sigmoid(masks) > 0.5
        for i in unsel:
            ious = mask_iou(bin_all[i][None], bin_all[:i]) if i else np.zeros(0)
            if (ious < self.nms_thr_post).all():
                ids[i] = -1
        self.update_memo(ids, bboxes, embeds, labels, frame_id)
        return bboxes, labels, ids

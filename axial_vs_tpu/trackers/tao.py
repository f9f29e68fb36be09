"""TAO tracker (host-side numpy).

Re-implements the matching core of
`MaXTron_Tube-Link/tracker/qdtrack/trackers/tao_tracker.py:20-215`
(the remainder of that file is mmcv-based visualization/analysis tooling):
EMA-embedding tracklets with a memo window, class-gated distractor NMS on
low-score detections, bisoftmax (+cosine) matching with object-score-diff
gating, greedy assignment in detection order, score momentum on matches.
"""
from __future__ import annotations

import numpy as np

from .similarity import bbox_overlaps, cal_similarity


class TaoTracker:
    def __init__(self, init_score_thr=0.0001, obj_score_thr=0.0001,
                 match_score_thr=0.5, memo_frames=10, momentum_embed=0.8,
                 momentum_obj_score=0.5, obj_score_diff_thr=1.0,
                 distractor_nms_thr=0.3, distractor_score_thr=0.5,
                 match_metric="bisoftmax", match_with_cosine=True):
        assert match_metric in ("bisoftmax", "cosine")
        self.init_score_thr = init_score_thr
        self.obj_score_thr = obj_score_thr
        self.match_score_thr = match_score_thr
        self.memo_frames = memo_frames
        self.momentum_embed = momentum_embed
        self.momentum_obj_score = momentum_obj_score
        self.obj_score_diff_thr = obj_score_diff_thr
        self.distractor_nms_thr = distractor_nms_thr
        self.distractor_score_thr = distractor_score_thr
        self.match_metric = match_metric
        self.match_with_cosine = match_with_cosine
        self.reset()

    def reset(self):
        self.num_tracklets = 0
        self.tracklets = {}

    @property
    def empty(self):
        return not self.tracklets

    def update_memo(self, ids, bboxes, labels, embeds, frame_id):
        for tid, bbox, embed, label in zip(ids, bboxes, embeds, labels):
            if tid < 0:
                continue
            tid = int(tid)
            if tid in self.tracklets:
                t = self.tracklets[tid]
                t["bbox"] = bbox
                t["label"] = label
                t["embed"] = ((1 - self.momentum_embed) * t["embed"]
                              + self.momentum_embed * embed)
                t["frame_id"] = frame_id
            else:
                self.tracklets[tid] = dict(
                    bbox=bbox, label=label, embed=embed.copy(),
                    frame_id=frame_id)
        for tid in [k for k, v in self.tracklets.items()
                    if frame_id - v["frame_id"] >= self.memo_frames]:
            self.tracklets.pop(tid)

    def _memo(self):
        ids = list(self.tracklets)
        bboxes = np.stack([self.tracklets[i]["bbox"] for i in ids])
        labels = np.asarray([self.tracklets[i]["label"] for i in ids])
        embeds = np.stack([self.tracklets[i]["embed"] for i in ids])
        return bboxes, labels, embeds, np.asarray(ids, np.int64)

    def match(self, bboxes, labels, track_feats, frame_id, temperature=-1.0):
        """bboxes (N, 5) xyxy+score; labels (N,); track_feats (N, E) or None.
        Returns (bboxes, labels, ids) after distractor NMS."""
        bboxes = np.array(bboxes, np.float32)
        labels = np.asarray(labels)
        if track_feats is None:
            return bboxes, labels, np.full((len(bboxes),), -1, np.int64)
        embeds = np.array(track_feats, np.float32)

        # class-gated distractor NMS on low-score detections (ref :137-150)
        valid = np.ones(len(bboxes), bool)
        low = np.nonzero(bboxes[:, -1] < self.distractor_score_thr)[0]
        ious = bbox_overlaps(bboxes[low, :4], bboxes[:, :4])
        ious *= labels[low][:, None] == labels[None, :]
        for i, ind in enumerate(low):
            if (ious[i, :ind] > self.distractor_nms_thr).any():
                valid[ind] = False
        bboxes, labels, embeds = bboxes[valid], labels[valid], embeds[valid]

        ids = np.full((len(bboxes),), -1, np.int64)
        if len(bboxes) > 0 and not self.empty:
            memo_bboxes, memo_labels, memo_embeds, memo_ids = self._memo()
            cat_same = labels[:, None] == memo_labels[None, :]
            if self.match_metric == "bisoftmax":
                sims = cal_similarity(embeds, memo_embeds, "dot_product",
                                      temperature)
                exps = np.exp(sims) * cat_same
                d2t = exps / (exps.sum(axis=1, keepdims=True) + 1e-6)
                t2d = exps / (exps.sum(axis=0, keepdims=True) + 1e-6)
                scores = (d2t + t2d) / 2
                if self.match_with_cosine:
                    cos = cal_similarity(embeds, memo_embeds, "cosine")
                    scores = (scores + cos * cat_same) / 2
            else:
                scores = cal_similarity(embeds, memo_embeds, "cosine") * cat_same

            diffs = np.abs(bboxes[:, -1][:, None] - memo_bboxes[:, -1][None, :])
            for i in range(len(bboxes)):
                if bboxes[i, -1] < self.obj_score_thr:
                    continue
                memo_ind = int(scores[i].argmax())
                conf = scores[i, memo_ind]
                if (conf > self.match_score_thr
                        and diffs[i, memo_ind] < self.obj_score_diff_thr):
                    ids[i] = memo_ids[memo_ind]
                    scores[:i, memo_ind] = 0
                    scores[i + 1:, memo_ind] = 0
                    m = self.momentum_obj_score
                    bboxes[i, -1] = (m * bboxes[i, -1]
                                     + (1 - m) * memo_bboxes[memo_ind, -1])

        new = (ids == -1) & (bboxes[:, -1] > self.init_score_thr)
        num_new = int(new.sum())
        ids[new] = np.arange(self.num_tracklets,
                             self.num_tracklets + num_new, dtype=np.int64)
        self.num_tracklets += num_new
        self.update_memo(ids, bboxes, labels, embeds, frame_id)
        return bboxes, labels, ids

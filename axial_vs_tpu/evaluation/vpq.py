"""Video Panoptic Quality (VPQ) — tube-matching PQ over sliding windows.

Re-implements the reference metric semantics
(`maxtron_deeplab/evaluation/video_panoptic_metrics.py:24-330`) on in-memory
int id maps (no PNG round-trip needed; a PNG/JSON adapter lives in the
evaluator): for each window of ``nframes`` consecutive frames, stack GT and
prediction id maps into tubes, build the confusion map via one
``np.unique`` on ``gt * OFFSET + pred``, match same-category tubes at
IoU > 0.5 (void subtracted from the union), count FP/FN with crowd/void
handling. VPQ@k = PQ over all windows; final VPQ = mean over the window
sizes {1, 2, 4, 6}.
"""
from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor
from typing import Dict

import numpy as np

OFFSET = 256 ** 3
VOID = 0


class PQStat:
    __slots__ = ("iou", "tp", "fp", "fn")

    def __init__(self):
        self.iou = defaultdict(float)
        self.tp = defaultdict(int)
        self.fp = defaultdict(int)
        self.fn = defaultdict(int)

    def __iadd__(self, other: "PQStat"):
        for d_self, d_other in zip(
            (self.iou, self.tp, self.fp, self.fn),
            (other.iou, other.tp, other.fp, other.fn),
        ):
            for k, v in d_other.items():
                d_self[k] += v
        return self

    def average(self, categories: Dict[int, dict], isthing=None):
        pq = sq = rq = n = 0
        per_class = {}
        for cat_id, info in categories.items():
            if isthing is not None and bool(info.get("isthing", 0)) != isthing:
                continue
            iou, tp = self.iou[cat_id], self.tp[cat_id]
            fp, fn = self.fp[cat_id], self.fn[cat_id]
            if tp + fp + fn == 0:
                per_class[cat_id] = dict(pq=0.0, sq=0.0, rq=0.0)
                continue
            n += 1
            pq_c = iou / (tp + 0.5 * fp + 0.5 * fn)
            sq_c = iou / tp if tp else 0.0
            rq_c = tp / (tp + 0.5 * fp + 0.5 * fn)
            per_class[cat_id] = dict(pq=pq_c, sq=sq_c, rq=rq_c)
            pq += pq_c
            sq += sq_c
            rq += rq_c
        n = max(n, 1)
        return dict(pq=pq / n, sq=sq / n, rq=rq / n, n=n), per_class


def vpq_single_video(
    gt_ids: np.ndarray,
    pred_ids: np.ndarray,
    gt_segments: Dict[int, dict],
    pred_segments: Dict[int, dict],
    nframes: int,
) -> PQStat:
    """gt_ids/pred_ids: (V, H, W) panoptic id maps, VOID = 0 (use
    ``ids + 1``-style encodings upstream so -1/void maps to 0).
    gt_segments: {id: {'category_id', 'iscrowd'}}; pred_segments:
    {id: {'category_id'}}."""
    stat = PQStat()
    v = gt_ids.shape[0]
    gt64 = gt_ids.astype(np.uint64)
    pred64 = pred_ids.astype(np.uint64)
    for start in range(0, v - nframes + 1):
        gt_tube = gt64[start : start + nframes]
        pred_tube = pred64[start : start + nframes]
        combined = gt_tube * OFFSET + pred_tube
        labels, counts = np.unique(combined, return_counts=True)
        inter = {(int(l // OFFSET), int(l % OFFSET)): int(c) for l, c in zip(labels, counts)}

        gt_areas = defaultdict(int)
        pred_areas = defaultdict(int)
        for (g, p), c in inter.items():
            gt_areas[g] += c
            pred_areas[p] += c

        gt_matched, pred_matched = set(), set()
        for (g, p), c in inter.items():
            if g not in gt_segments or p not in pred_segments:
                continue
            ginfo = gt_segments[g]
            if ginfo.get("iscrowd", 0) == 1:
                continue
            if ginfo["category_id"] != pred_segments[p]["category_id"]:
                continue
            union = pred_areas[p] + gt_areas[g] - c - inter.get((VOID, p), 0)
            iou = c / union
            if iou > 0.5:
                cat = ginfo["category_id"]
                stat.tp[cat] += 1
                stat.iou[cat] += iou
                gt_matched.add(g)
                pred_matched.add(p)

        crowd_by_cat = {}
        for g, area in gt_areas.items():
            if g == VOID or g in gt_matched or g not in gt_segments:
                continue
            info = gt_segments[g]
            if info.get("iscrowd", 0) == 1:
                crowd_by_cat[info["category_id"]] = g
                continue
            stat.fn[info["category_id"]] += 1

        for p, area in pred_areas.items():
            if p == VOID or p in pred_matched or p not in pred_segments:
                continue
            cat = pred_segments[p]["category_id"]
            ignored = inter.get((VOID, p), 0)
            if cat in crowd_by_cat:
                ignored += inter.get((crowd_by_cat[cat], p), 0)
            if ignored / area > 0.5:
                continue
            stat.fp[cat] += 1
    return stat


def _vpq_worker(args):
    gt_ids, pred_ids, gt_segments, pred_segments, nframes = args
    return vpq_single_video(gt_ids, pred_ids, gt_segments, pred_segments, nframes)


def vpq_compute(
    videos,
    categories: Dict[int, dict],
    window_sizes=(1, 2, 4, 6),
    num_workers: int = 0,
    use_native: bool = True,
):
    """videos: iterable of (gt_ids, pred_ids, gt_segments, pred_segments).
    Returns {'vpq': mean over windows, 'per_window': {k: {...}}}. Uses the
    native threaded core (native/vpq_core.cpp) when available."""
    native_fn = None
    if use_native:
        try:
            from .vpq_native import vpq_single_video_native as native_fn
        except Exception:
            native_fn = None
    videos = list(videos)
    per_window = {}
    for nframes in window_sizes:
        stat = PQStat()
        jobs = [(g, p, gs, ps, nframes) for g, p, gs, ps in videos]
        if native_fn is not None:
            for g, p, gs, ps, nf in jobs:
                s = native_fn(g, p, gs, ps, nf)
                stat += s if s is not None else _vpq_worker((g, p, gs, ps, nf))
        elif num_workers > 1:
            with ProcessPoolExecutor(max_workers=num_workers) as ex:
                for s in ex.map(_vpq_worker, jobs):
                    stat += s
        else:
            for job in jobs:
                stat += _vpq_worker(job)
        all_res, _ = stat.average(categories, None)
        things, _ = stat.average(categories, True)
        stuff, _ = stat.average(categories, False)
        per_window[nframes] = dict(all=all_res, things=things, stuff=stuff)
    vpq = float(np.mean([per_window[k]["all"]["pq"] for k in window_sizes]))
    return dict(vpq=vpq, per_window=per_window)

"""Image Panoptic Quality (COCO PQ) — panopticapi-equivalent.

Single-image PQ is exactly tube-PQ with a 1-frame window, so this wraps the
verified VPQ core (`evaluation/vpq.py`; the reference's image evaluator is
`kmax_deeplab/evaluation/panoptic_evaluation.py:80-195`).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .vpq import PQStat, vpq_single_video


def pq_compute_single(gt_ids, pred_ids, gt_segments, pred_segments) -> PQStat:
    """gt_ids/pred_ids: (H, W) id maps, 0 = void."""
    return vpq_single_video(
        gt_ids[None], pred_ids[None], gt_segments, pred_segments, nframes=1
    )


def pq_compute(images, categories: Dict[int, dict], num_workers: int = 0):
    """images: iterable of (gt_ids, pred_ids, gt_segments, pred_segments)."""
    stat = PQStat()
    for gt_ids, pred_ids, gt_segments, pred_segments in images:
        stat += pq_compute_single(gt_ids, pred_ids, gt_segments, pred_segments)
    all_res, per_class = stat.average(categories, None)
    things, _ = stat.average(categories, True)
    stuff, _ = stat.average(categories, False)
    return dict(all=all_res, things=things, stuff=stuff, per_class=per_class)

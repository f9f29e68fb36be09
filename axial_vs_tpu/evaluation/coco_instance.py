"""COCO instance-segmentation AP (V23 instance_evaluation): a thin wrapper
over the video AP evaluator with 1-frame "videos" — per-image greedy COCO
matching at IoU .50:.95 with 101-pt AP, which is the COCOeval core the
reference's `kmax_deeplab/evaluation/instance_evaluation.py` delegates to."""
from __future__ import annotations

import numpy as np

from ..data import mask_rle
from .ytvis_eval import YTVISEvaluator


def instances_to_records(image_id, masks, labels, scores,
                         score_threshold: float = 0.0):
    """masks (k, H, W) bool/prob -> prediction records."""
    out = []
    for k in range(len(scores)):
        if scores[k] < score_threshold:
            continue
        m = np.asarray(masks[k] > 0.5, np.uint8)
        out.append(
            dict(
                video_id=image_id,
                category_id=int(labels[k]),
                score=float(scores[k]),
                segmentations=[mask_rle.encode(m) if m.any() else None],
            )
        )
    return out


def gt_to_records(image_id, masks, labels, iscrowd=None):
    out = []
    for k in range(len(labels)):
        m = np.asarray(masks[k] > 0.5, np.uint8)
        out.append(
            dict(
                video_id=image_id,
                category_id=int(labels[k]),
                segmentations=[mask_rle.encode(m)],
                iscrowd=int(iscrowd[k]) if iscrowd is not None else 0,
            )
        )
    return out


def coco_instance_ap(gt_records, pred_records):
    return YTVISEvaluator(crowd_iou=True).evaluate(gt_records, pred_records)

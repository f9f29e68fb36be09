"""COCO instance-segmentation AP (V23 instance_evaluation): a thin wrapper
over the video AP evaluator with 1-frame "videos" — per-image greedy COCO
matching at IoU .50:.95 with 101-pt AP, which is the COCOeval core the
reference's `kmax_deeplab/evaluation/instance_evaluation.py` delegates to.

Reports BOTH segm and bbox AP like the reference evaluator (its tasks come
from the predictions, and kMaX's `instance_inference` attaches boxes
derived from the predicted masks — `kmax_model.py` via
``BitMasks.get_bounding_boxes``): boxes here are the mask extents."""
from __future__ import annotations

import numpy as np

from ..data import mask_rle
from .ytvis_eval import YTVISEvaluator


def mask_to_box(m):
    """Tight [x, y, w, h] around a binary mask (d2 BitMasks
    ``get_bounding_boxes`` extents, xyxy -> xywh), or None if empty."""
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        return None
    x0, x1 = float(xs.min()), float(xs.max()) + 1.0
    y0, y1 = float(ys.min()), float(ys.max()) + 1.0
    return [x0, y0, x1 - x0, y1 - y0]


def instances_to_records(image_id, masks, labels, scores,
                         score_threshold: float = 0.0):
    """masks (k, H, W) bool/prob -> prediction records (segm + box)."""
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
                bboxes=[mask_to_box(m)],
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
                bboxes=[mask_to_box(m)],
                iscrowd=int(iscrowd[k]) if iscrowd is not None else 0,
            )
        )
    return out


def coco_instance_ap(gt_records, pred_records, tasks=("segm", "bbox")):
    """{task: COCOeval summary dict}; pycocotools semantics per task
    (bbox GT area-range filtering keeps the ANNOTATION area, i.e. the
    mask area, exactly like pycocotools loadRes/COCOeval)."""
    results = {}
    for task in tasks:
        results[task] = YTVISEvaluator(
            crowd_iou=True, iou_type=task).evaluate(
            gt_records, pred_records)
    return results if len(tasks) > 1 else results[tasks[0]]

"""ctypes binding for the native VPQ core (native/vpq_core.cpp).

Builds on demand with the system g++ (no pip deps); falls back to the pure
numpy implementation (evaluation/vpq.py) when unavailable. Semantics are
identical — the numpy version doubles as the test oracle.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .vpq import PQStat

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvpq_core.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vpq_stats.restype = ctypes.c_int
    lib.vpq_stats.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def vpq_single_video_native(gt_ids, pred_ids, gt_segments, pred_segments,
                            nframes, num_threads: int = 8):
    """Same contract as evaluation.vpq.vpq_single_video; returns PQStat or
    None if the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    gt = np.ascontiguousarray(gt_ids.reshape(gt_ids.shape[0], -1), np.int32)
    pred = np.ascontiguousarray(pred_ids.reshape(pred_ids.shape[0], -1), np.int32)
    cats = sorted(
        {s["category_id"] for s in gt_segments.values()}
        | {s["category_id"] for s in pred_segments.values()}
    )
    cat_to_dense = {c: i for i, c in enumerate(cats)}
    n_cats = len(cats)

    g_ids = np.asarray(list(gt_segments.keys()), np.int64)
    g_cats = np.asarray(
        [cat_to_dense[gt_segments[i]["category_id"]] for i in g_ids], np.int64
    )
    g_crowd = np.asarray(
        [gt_segments[i].get("iscrowd", 0) for i in g_ids], np.uint8
    )
    p_ids = np.asarray(list(pred_segments.keys()), np.int64)
    p_cats = np.asarray(
        [cat_to_dense[pred_segments[i]["category_id"]] for i in p_ids], np.int64
    )

    iou = np.zeros(n_cats, np.float64)
    tp = np.zeros(n_cats, np.int64)
    fp = np.zeros(n_cats, np.int64)
    fn = np.zeros(n_cats, np.int64)
    rc = lib.vpq_stats(
        gt.ctypes.data, pred.ctypes.data, gt.shape[0], gt.shape[1],
        int(nframes),
        g_ids.ctypes.data, g_cats.ctypes.data, g_crowd.ctypes.data, len(g_ids),
        p_ids.ctypes.data, p_cats.ctypes.data, len(p_ids),
        n_cats, int(num_threads),
        iou.ctypes.data, tp.ctypes.data, fp.ctypes.data, fn.ctypes.data,
    )
    if rc != 0:
        return None
    stat = PQStat()
    for i, c in enumerate(cats):
        if tp[i]:
            stat.tp[c] = int(tp[i])
            stat.iou[c] = float(iou[i])
        if fp[i]:
            stat.fp[c] = int(fp[i])
        if fn[i]:
            stat.fn[c] = int(fn[i])
    return stat

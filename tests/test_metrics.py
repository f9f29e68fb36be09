"""VPQ / STQ metric cores vs the reference's importable numpy implementations."""
import copy
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/MaXTron_Video-kMaX/tools")
sys.path.insert(0, "/root/reference/MaXTron_Video-kMaX/maxtron_deeplab/evaluation")

from axial_vs_tpu.evaluation.stq import STQuality
from axial_vs_tpu.evaluation.vpq import vpq_single_video, vpq_compute, PQStat


def _random_video(rng, v=4, h=24, w=32, n_gt=5, n_pred=5, n_cat=4):
    gt = rng.randint(0, n_gt + 1, (v, h, w)).astype(np.int32)
    pred = rng.randint(0, n_pred + 1, (v, h, w)).astype(np.int32)
    # make prediction correlated with gt so some IoUs pass 0.5
    agree = rng.rand(v, h, w) < 0.75
    pred = np.where(agree, gt, pred)
    gt_segments = {
        i: {"category_id": int(rng.randint(0, n_cat)), "iscrowd": int(rng.rand() < 0.1)}
        for i in range(1, n_gt + 1)
    }
    pred_segments = {
        i: {"category_id": gt_segments[min(i, n_gt)]["category_id"]}
        for i in range(1, n_pred + 1)
    }
    return gt, pred, gt_segments, pred_segments


def test_vpq_against_reference_oracle(tmp_path):
    import video_panoptic_metrics as ref_vpq
    from PIL import Image

    rng = np.random.RandomState(0)
    gt, pred, gt_segments, pred_segments, = _random_video(rng)
    v, h, w = gt.shape
    categories = {c: {"isthing": int(c % 2 == 0)} for c in range(4)}

    # reference wants PNG files (id = R + G*256 + B*256^2) + per-frame JSONs
    def dump(ids, name):
        paths = []
        for i in range(v):
            rgb = np.zeros((h, w, 3), np.uint8)
            rgb[..., 0] = ids[i] % 256
            rgb[..., 1] = (ids[i] // 256) % 256
            paths.append(tmp_path / f"{name}_{i}.png")
            Image.fromarray(rgb).save(paths[-1])
        return paths

    gt_paths = dump(gt, "gt")
    pred_paths = dump(pred, "pred")

    gt_pred_set = []
    for i in range(v):
        gt_json = {
            "segments_info": [
                {
                    "id": sid,
                    "category_id": info["category_id"],
                    "iscrowd": info["iscrowd"],
                    "area": int((gt[i] == sid).sum()),
                }
                for sid, info in gt_segments.items()
                if (gt[i] == sid).any()
            ]
        }
        pred_json = {
            "segments_info": [
                {"id": sid, "category_id": info["category_id"]}
                for sid, info in pred_segments.items()
                if (pred[i] == sid).any()
            ]
        }
        gt_pred_set.append((gt_json, pred_json, str(gt_paths[i]), str(pred_paths[i]), {}))

    for nframes in (1, 2):
        ref_stat = ref_vpq.vpq_compute_single_core(categories, nframes, gt_pred_set)
        got_stat = vpq_single_video(gt, pred, gt_segments, pred_segments, nframes)
        for cat in categories:
            assert ref_stat[cat].tp == got_stat.tp[cat], (nframes, cat)
            assert ref_stat[cat].fp == got_stat.fp[cat], (nframes, cat)
            assert ref_stat[cat].fn == got_stat.fn[cat], (nframes, cat)
            np.testing.assert_allclose(ref_stat[cat].iou, got_stat.iou[cat], rtol=1e-9)


def test_stq_against_reference_oracle():
    import segmentation_and_tracking_quality as ref_stq

    num_classes, shift = 5, 16
    things = [1, 2]
    rng = np.random.RandomState(1)

    ref = ref_stq.STQuality(num_classes, things, 255, shift, 2 ** 32)
    got = STQuality(num_classes, things, 255, shift, 2 ** 32)

    for seq in range(2):
        for frame in range(3):
            sem_t = rng.randint(0, num_classes, (20, 30))
            sem_t[rng.rand(20, 30) < 0.05] = 255
            inst_t = rng.randint(0, 4, (20, 30))
            sem_p = np.where(rng.rand(20, 30) < 0.8, sem_t, rng.randint(0, num_classes, (20, 30)))
            sem_p = np.where(sem_p == 255, rng.randint(0, num_classes, (20, 30)), sem_p)
            inst_p = rng.randint(0, 4, (20, 30))
            y_true = (sem_t.astype(np.int64) << shift) + inst_t
            y_pred = (sem_p.astype(np.int64) << shift) + inst_p
            ref.update_state(y_true, y_pred, sequence_id=seq)
            got.update_state(y_true, y_pred, sequence_id=seq)

    r = ref.result()
    g = got.result()
    np.testing.assert_allclose(g["AQ"], r["AQ"], rtol=1e-9)
    np.testing.assert_allclose(g["IoU"], r["IoU"], rtol=1e-9)
    np.testing.assert_allclose(g["STQ"], r["STQ"], rtol=1e-9)


def test_vpq_compute_aggregates():
    rng = np.random.RandomState(2)
    videos = [
        _random_video(rng)
        for _ in range(2)
    ]
    categories = {c: {"isthing": int(c % 2 == 0)} for c in range(4)}
    res = vpq_compute(videos, categories, window_sizes=(1, 2))
    assert 0 <= res["vpq"] <= 1
    assert set(res["per_window"]) == {1, 2}


def test_native_vpq_matches_numpy():
    from axial_vs_tpu.evaluation.vpq_native import vpq_single_video_native, load_library

    if load_library() is None:
        import pytest
        pytest.skip("native vpq core unavailable")
    rng = np.random.RandomState(5)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        gt, pred, gt_segments, pred_segments = _random_video(rng, v=6, h=40, w=50)
        for nframes in (1, 3):
            ref = vpq_single_video(gt, pred, gt_segments, pred_segments, nframes)
            got = vpq_single_video_native(gt, pred, gt_segments, pred_segments, nframes)
            assert got is not None
            for cat in set(list(ref.tp) + list(got.tp)):
                assert ref.tp[cat] == got.tp[cat]
                assert ref.fp[cat] == got.fp[cat]
                assert ref.fn[cat] == got.fn[cat]
                np.testing.assert_allclose(ref.iou[cat], got.iou[cat], rtol=1e-12)


def test_dstq_against_reference_oracle():
    # the reference file uses a relative import; exec it with a patched one
    sys.path.insert(0, "/root/reference/MaXTron_Tube-Link/datasets/utils")
    src = open("/root/reference/MaXTron_Tube-Link/datasets/utils/DSTQ.py").read()
    ns = {}
    exec(src.replace("from .STQ import", "from STQ import"), ns)
    RefDSTQ = ns["DSTQuality"]

    from axial_vs_tpu.evaluation.dstq import DSTQuality

    num_classes, shift = 4, 16
    rng = np.random.RandomState(0)
    ref = RefDSTQ(num_classes, [1], 255, shift, 2 ** 32, (1.25, 1.1))
    got = DSTQuality(num_classes, [1], 255, shift, 2 ** 32, (1.25, 1.1))
    for f in range(3):
        sem = rng.randint(0, num_classes, (16, 20))
        inst = rng.randint(0, 3, (16, 20))
        y_true = (sem.astype(np.int64) << shift) + inst
        y_pred = (np.where(rng.rand(16, 20) < 0.8, sem,
                           rng.randint(0, num_classes, (16, 20))).astype(np.int64) << shift) + inst
        d_true = rng.rand(16, 20) * 10
        d_pred = d_true * rng.uniform(0.8, 1.3, (16, 20))
        ref.update_state(y_true, y_pred, d_true, d_pred, sequence_id=0)
        got.update_state(y_true, y_pred, d_true, d_pred, sequence_id=0)
    r, g = ref.result(), got.result()
    np.testing.assert_allclose(g["DSTQ"], r["DSTQ"], rtol=1e-9)
    np.testing.assert_allclose(g["DQ"], r["DQ"], rtol=1e-9)

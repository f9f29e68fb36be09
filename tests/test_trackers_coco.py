"""Trackers + COCO data/PQ tests."""
import json

import numpy as np
import pytest
from PIL import Image

from axial_vs_tpu.trackers.minivis import MiniVISTracker
from axial_vs_tpu.trackers.quasi_dense import QuasiDenseEmbedTracker
from axial_vs_tpu.trackers.kalman import KalmanFilter
from axial_vs_tpu.evaluation.pq import pq_compute
from axial_vs_tpu.data.panoptic_utils import id2rgb
from axial_vs_tpu.data.coco import load_coco_panoptic_json, CocoPanopticMapper

import pytest as _pytest

pytestmark = _pytest.mark.parity


def test_minivis_tracker(rng):
    tr = MiniVISTracker()
    base = rng.randn(5, 16).astype(np.float32)
    ids0 = tr.match(base)
    np.testing.assert_array_equal(ids0, np.arange(5))
    perm = rng.permutation(5)
    ids1 = tr.match(base[perm])
    np.testing.assert_array_equal(ids1, perm)


def test_quasi_dense_tracker(rng):
    tr = QuasiDenseEmbedTracker(init_score_thr=0.5, obj_score_thr=0.3,
                                match_score_thr=0.1)
    e0 = np.eye(3, 16, dtype=np.float32) * 5
    ids0 = tr.match(e0, np.array([0, 1, 2]), np.array([0.9, 0.9, 0.9]), 0)
    assert set(ids0) == {0, 1, 2}
    # same embeddings later frame -> same ids
    ids1 = tr.match(e0[[2, 0, 1]], np.array([2, 0, 1]), np.array([0.9] * 3), 1)
    np.testing.assert_array_equal(ids1, ids0[[2, 0, 1]])
    # low score detection dropped
    ids2 = tr.match(e0[:1], np.array([0]), np.array([0.1]), 2)
    assert ids2[0] == -1


def test_kalman_filter():
    kf = KalmanFilter()
    m, c = kf.initiate(np.array([10.0, 20.0, 0.5, 8.0]))
    m, c = kf.predict(m, c)
    m2, c2 = kf.update(m, c, np.array([11.0, 21.0, 0.5, 8.0]))
    assert np.isfinite(m2).all()
    d = kf.gating_distance(m2, c2, np.array([[11.0, 21.0, 0.5, 8.0]]))
    assert d[0] < 1.0


def test_pq_perfect_prediction(rng):
    ids = rng.randint(0, 4, (32, 32)).astype(np.int32) + 1
    segments = {i: {"category_id": i % 2, "iscrowd": 0} for i in range(1, 5)}
    res = pq_compute(
        [(ids, ids, segments, segments)],
        categories={0: {"isthing": 1}, 1: {"isthing": 0}},
    )
    assert res["all"]["pq"] == pytest.approx(1.0)


def test_coco_mapper(tmp_path, rng):
    img_root = tmp_path / "imgs"
    pan_root = tmp_path / "pans"
    img_root.mkdir()
    pan_root.mkdir()
    Image.fromarray(rng.randint(0, 255, (40, 60, 3), np.uint8)).save(
        img_root / "a.jpg"
    )
    pan = np.zeros((40, 60), np.int32)
    pan[5:20, 5:30] = 7
    pan[25:35, 40:55] = 9
    Image.fromarray(id2rgb(pan)).save(pan_root / "a.png")
    data = dict(
        images=[dict(id=1, file_name="a.jpg", height=40, width=60)],
        annotations=[dict(image_id=1, file_name="a.png", segments_info=[
            dict(id=7, category_id=3, iscrowd=0),
            dict(id=9, category_id=5, iscrowd=0),
        ])],
        categories=[dict(id=3, isthing=1), dict(id=5, isthing=0)],
    )
    jp = tmp_path / "panoptic.json"
    jp.write_text(json.dumps(data))
    records, cats = load_coco_panoptic_json(str(jp), str(img_root), str(pan_root))
    assert len(records) == 1 and 3 in cats
    mapper = CocoPanopticMapper(image_size=(48, 64), max_instances=8)
    sample = mapper(records[0])
    assert sample["images"].shape == (48, 64, 3)
    assert sample["targets"]["masks"].shape == (8, 12, 16)
    assert sample["targets"]["valid"].sum() >= 1

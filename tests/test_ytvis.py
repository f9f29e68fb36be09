"""RLE codec, YTVIS dataset mapper, and AP evaluation tests."""
import json

import numpy as np
import pytest
from PIL import Image

from axial_vs_tpu.data import mask_rle
from axial_vs_tpu.data.ytvis import (
    load_ytvis_json, YTVISClipMapper, results_to_ytvis_json,
)
from axial_vs_tpu.evaluation.ytvis_eval import YTVISEvaluator, video_iou


def test_rle_roundtrip(rng):
    for _ in range(5):
        mask = (rng.rand(23, 31) > 0.6).astype(np.uint8)
        rle = mask_rle.encode(mask)
        np.testing.assert_array_equal(mask_rle.decode(rle), mask)
        assert mask_rle.area(rle) == mask.sum()


def test_rle_known_value():
    # all-zeros and all-ones sanity
    z = np.zeros((4, 5), np.uint8)
    assert mask_rle.decode(mask_rle.encode(z)).sum() == 0
    o = np.ones((4, 5), np.uint8)
    np.testing.assert_array_equal(mask_rle.decode(mask_rle.encode(o)), o)


def test_video_iou():
    h, w = 8, 8
    a = np.zeros((h, w), np.uint8); a[:4] = 1
    b = np.zeros((h, w), np.uint8); b[2:6] = 1
    ra, rb = mask_rle.encode(a), mask_rle.encode(b)
    # two frames identical overlap: IoU = inter/union = 16/48
    assert abs(video_iou([ra, ra], [rb, rb]) - 16 / 48) < 1e-9
    # absent gt frame counts pred area into union: 16 / (48 + 32)
    assert abs(video_iou([ra, ra], [rb, None]) - 16 / 80) < 1e-9


@pytest.fixture
def ytvis_dataset(tmp_path):
    img_root = tmp_path / "imgs"
    rng = np.random.RandomState(0)
    videos, annotations = [], []
    for vid in range(2):
        files = []
        for f in range(6):
            p = img_root / f"v{vid}" / f"{f:03d}.jpg"
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(rng.randint(0, 255, (32, 48, 3), np.uint8)).save(p)
            files.append(f"v{vid}/{f:03d}.jpg")
        videos.append(dict(id=vid + 1, file_names=files, height=32, width=48, length=6))
        segs = []
        for f in range(6):
            m = np.zeros((32, 48), np.uint8)
            m[5:20, 5 + f : 25 + f] = 1
            segs.append(mask_rle.encode(m))
        annotations.append(dict(id=vid + 1, video_id=vid + 1, category_id=1,
                                segmentations=segs, iscrowd=0))
    data = dict(videos=videos, annotations=annotations,
                categories=[dict(id=1, name="obj")])
    json_path = tmp_path / "ytvis.json"
    json_path.write_text(json.dumps(data))
    return str(img_root), str(json_path)


def test_ytvis_mapper(ytvis_dataset):
    img_root, json_path = ytvis_dataset
    videos, cats = load_ytvis_json(json_path, img_root)
    assert len(videos) == 2 and 1 in cats
    mapper = YTVISClipMapper(image_size=(32, 48), num_frames=3, max_instances=4)
    sample = mapper(videos[0])
    assert sample["images"].shape == (3, 32, 48, 3)
    assert sample["targets"]["masks"].shape == (4, 3, 8, 12)
    assert sample["targets"]["valid"][0]


def test_ytvis_ap_perfect_and_miss(ytvis_dataset):
    img_root, json_path = ytvis_dataset
    videos, _ = load_ytvis_json(json_path, img_root)
    gts = []
    for v in videos:
        for a in v["annotations"]:
            gts.append(dict(video_id=v["video_id"], category_id=a["category_id"],
                            segmentations=a["segmentations"], iscrowd=0))
    # perfect predictions -> AP 1.0
    preds = [dict(video_id=g["video_id"], category_id=g["category_id"],
                  score=0.9, segmentations=g["segmentations"]) for g in gts]
    res = YTVISEvaluator().evaluate(gts, preds)
    assert res["AP"] == pytest.approx(1.0)
    # shifted predictions -> lower AP
    bad = []
    for g in gts:
        m = np.zeros((32, 48), np.uint8)
        m[25:31, 40:47] = 1
        bad.append(dict(video_id=g["video_id"], category_id=g["category_id"],
                        score=0.9, segmentations=[mask_rle.encode(m)] * 6))
    res_bad = YTVISEvaluator().evaluate(gts, bad)
    assert res_bad["AP"] < 0.1


def test_results_serialization(rng):
    inst = {
        "masks": (rng.rand(2, 3, 8, 8) > 0.5).astype(np.float32),
        "labels": np.array([1, 1]),
        "scores": np.array([0.9, 0.4]),
    }
    out = results_to_ytvis_json([(7, inst)])
    assert len(out) == 2
    assert out[0]["video_id"] == 7 and len(out[0]["segmentations"]) == 3

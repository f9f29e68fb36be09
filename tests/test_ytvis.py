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


def test_matches_reference_devkit(rng):
    """AP/AR parity with the vendored YTVIS devkit
    (`datasets/datasets/core/ytviseval.py`) on random synthetic videos —
    exercises area ranges, crowd ignores, maxDets and absent frames."""
    from reference_shims import load_ytvis_devkit

    api_mod, ev_mod = load_ytvis_devkit()
    from axial_vs_tpu.data import mask_rle
    h, w, t, n_vids, n_cats = 300, 320, 3, 4, 3

    def rand_track(kind):
        segs, areas = [], []
        # one size per track so avg_area lands squarely in one range
        size = {"small": rng.randint(8, 120),
                "medium": rng.randint(130, 250),
                "large": rng.randint(258, 290)}[kind]
        for _ in range(t):
            if rng.rand() < 0.2:
                segs.append(None)
                areas.append(None)
                continue
            m = np.zeros((h, w), np.uint8)
            y0, x0 = rng.randint(0, h - size), rng.randint(0, w - size)
            m[y0:y0 + size, x0:x0 + size] = 1
            segs.append(mask_rle.encode(m))
            areas.append(int(m.sum()))
        return segs, areas

    videos = [{"id": v + 1, "height": h, "width": w,
               "file_names": [f"{v}/{i}.jpg" for i in range(t)]}
              for v in range(n_vids)]
    anns, results = [], []
    aid = 1
    for v in range(n_vids):
        for k in range(rng.randint(3, 6)):
            cat = int(rng.randint(1, n_cats + 1))
            kind = ("small", "medium", "large")[k % 3]
            segs, areas = rand_track(kind)
            anns.append({"id": aid, "video_id": v + 1, "category_id": cat,
                         "segmentations": segs, "areas": areas,
                         "iscrowd": int(rng.rand() < 0.15)})
            aid += 1
            # detections: a jittered copy + noise detections
            if rng.rand() < 0.85:
                results.append({"video_id": v + 1, "category_id": cat,
                                "segmentations": segs,
                                "score": float(rng.rand())})
            nsegs, _ = rand_track(("small", "medium", "large")[
                rng.randint(3)])
            results.append({"video_id": v + 1,
                            "category_id": int(rng.randint(1, n_cats + 1)),
                            "segmentations": nsegs,
                            "score": float(rng.rand())})

    dataset = {
        "videos": videos,
        "annotations": anns,
        "categories": [{"id": c + 1, "name": str(c)} for c in range(n_cats)],
    }
    gt_api = api_mod.YTVIS()
    gt_api.dataset = dataset
    gt_api.createIndex()
    dt_api = gt_api.loadRes([dict(r) for r in results])
    E = ev_mod.YTVISeval(gt_api, dt_api, iouType="segm")
    E.params.vidIds = [v["id"] for v in videos]
    E.evaluate()
    E.accumulate()
    E.summarize()
    # devkit stats: [AP, AP50, AP75, APs, APm, APl, AR@1, AR@10, AR@100, ...]
    want = E.stats

    gts = [{"video_id": a["video_id"], "category_id": a["category_id"],
            "segmentations": a["segmentations"], "areas": a["areas"],
            "iscrowd": a["iscrowd"]} for a in anns]
    preds = [dict(r) for r in results]
    got = YTVISEvaluator().evaluate(gts, preds)

    np.testing.assert_allclose(got["AP"], want[0], atol=1e-8)
    np.testing.assert_allclose(got["AP50"], want[1], atol=1e-8)
    np.testing.assert_allclose(got["AP75"], want[2], atol=1e-8)
    np.testing.assert_allclose(got["AP_small"], want[3], atol=1e-8)
    np.testing.assert_allclose(got["AP_medium"], want[4], atol=1e-8)
    np.testing.assert_allclose(got["AP_large"], want[5], atol=1e-8)
    np.testing.assert_allclose(got["AR@1"], want[6], atol=1e-8)
    np.testing.assert_allclose(got["AR@10"], want[7], atol=1e-8)
    np.testing.assert_allclose(got["AR@100"], want[8], atol=1e-8)
    # fixture must actually exercise every area range
    assert got["AP_small"] > -1 and got["AP_medium"] > -1 \
        and got["AP_large"] > -1

"""Sampler + COCO instance AP tests."""
import itertools

import numpy as np

from axial_vs_tpu.data.samplers import (
    InfiniteSampler, ClassAwareSampler, GroupSampler,
)
from axial_vs_tpu.evaluation.coco_instance import (
    instances_to_records, gt_to_records, coco_instance_ap,
)


def test_infinite_sampler_sharded():
    s0 = InfiniteSampler(10, seed=1, shard_id=0, num_shards=2)
    s1 = InfiniteSampler(10, seed=1, shard_id=1, num_shards=2)
    a = list(itertools.islice(iter(s0), 5))
    b = list(itertools.islice(iter(s1), 5))
    assert sorted(a + b) == list(range(10))


def test_class_aware_oversamples_rare():
    # class 1 appears once, class 0 in all others
    record_classes = [[0]] * 99 + [[1]]
    s = ClassAwareSampler(record_classes, repeat_thresh=0.1, seed=0)
    draw = list(itertools.islice(iter(s), 2000))
    rare_frac = sum(1 for i in draw if i == 99) / len(draw)
    assert rare_frac > 1.5 / 100  # oversampled vs uniform 1/100


def test_group_sampler_homogeneous_batches():
    group_ids = [0, 0, 0, 0, 1, 1, 1, 1]
    s = GroupSampler(group_ids, batch_size=2, seed=0)
    for batch in itertools.islice(iter(s), 8):
        gs = {group_ids[i] for i in batch}
        assert len(gs) == 1 and len(batch) == 2


def test_coco_instance_ap_perfect(rng):
    masks = (rng.rand(3, 16, 16) > 0.5).astype(np.float32)
    labels = np.array([1, 2, 1])
    gts, preds = [], []
    for img in range(2):
        gts += gt_to_records(img, masks, labels)
        preds += instances_to_records(img, masks, labels, np.array([0.9, 0.8, 0.7]))
    res = coco_instance_ap(gts, preds)
    assert abs(res["segm"]["AP"] - 1.0) < 1e-9
    assert abs(res["bbox"]["AP"] - 1.0) < 1e-9


def test_coco_bbox_ap_matches_segm_on_rectangles(rng):
    """bbox AP semantics pinned against the (devkit-pinned) segm path: for
    RECTANGULAR masks a box equals its mask, so the two tasks must produce
    identical metrics — including area-range buckets and crowd handling."""
    def rect_mask(h, w, y0, x0, hh, ww):
        m = np.zeros((h, w), np.float32)
        m[y0:y0 + hh, x0:x0 + ww] = 1.0
        return m

    gts, preds = [], []
    for img in range(3):
        g = np.stack([
            rect_mask(64, 64, 4, 4, 10, 12),
            rect_mask(64, 64, 30, 20, 20, 30),
        ])
        d = np.stack([
            rect_mask(64, 64, 5, 5, 10, 12),    # near-hit
            rect_mask(64, 64, 32, 22, 18, 28),  # near-hit
            rect_mask(64, 64, 1, 50, 6, 8),     # false positive
        ])
        gts += gt_to_records(img, g, np.array([1, 2]),
                             iscrowd=[0, img == 2])
        preds += instances_to_records(
            img, d, np.array([1, 2, 1]), np.array([0.9, 0.8, 0.3]))
    res = coco_instance_ap(gts, preds)
    for key, val in res["segm"].items():
        if isinstance(val, dict):  # per-category breakdowns
            for ck, cv in val.items():
                assert abs(cv - res["bbox"][key][ck]) < 1e-9, (key, ck)
        else:
            assert abs(val - res["bbox"][key]) < 1e-9, key
    assert 0.0 < res["bbox"]["AP"] <= 1.0


def test_coco_bbox_ap_differs_on_nonrect_masks(rng):
    """A diagonal mask's box IoU exceeds its mask IoU — bbox AP must see
    the looser overlap (sanity that the bbox path isn't reusing masks)."""
    from axial_vs_tpu.evaluation.coco_instance import mask_to_box

    h = w = 32
    diag = np.eye(h, dtype=np.float32)
    shifted = np.roll(diag, 8, axis=1) * (np.arange(w) >= 8)
    gts = gt_to_records(0, np.stack([diag]), np.array([1]))
    preds = instances_to_records(0, np.stack([shifted]),
                                 np.array([1]), np.array([0.9]))
    res = coco_instance_ap(gts, preds)
    # masks barely overlap -> segm AP 0; boxes overlap heavily -> bbox AP>0
    assert res["segm"]["AP"] == 0.0
    assert res["bbox"]["AP"] > 0.0
    assert mask_to_box(diag) == [0.0, 0.0, 32.0, 32.0]

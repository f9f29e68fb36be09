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
    assert abs(res["AP"] - 1.0) < 1e-9

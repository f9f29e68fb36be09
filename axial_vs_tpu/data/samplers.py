"""Samplers (replaces mmdet's distributed/group/infinite/class-aware
samplers, SURVEY T2): index streams consumed by the loader. All are
per-host: under multi-host DP each process seeds with its process index so
shards are disjoint (the d2 ``TrainingSampler`` convention).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Iterator, Sequence

import numpy as np


class InfiniteSampler:
    """Shuffled epochs, forever."""

    def __init__(self, size: int, seed: int = 0, shard_id: int = 0,
                 num_shards: int = 1, shuffle: bool = True):
        self.size = size
        self.rng = np.random.RandomState(seed)
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle

    def __iter__(self) -> Iterator[int]:
        while True:
            order = (
                self.rng.permutation(self.size) if self.shuffle
                else np.arange(self.size)
            )
            yield from order[self.shard_id :: self.num_shards].tolist()


class ClassAwareSampler:
    """Repeat-factor sampling: oversample records containing rare classes
    (mmdet ClassAwareSampler / d2 RepeatFactorTrainingSampler semantics)."""

    def __init__(self, record_classes: Sequence[Sequence[int]],
                 repeat_thresh: float = 0.001, seed: int = 0):
        counts = defaultdict(int)
        n = len(record_classes)
        for classes in record_classes:
            for c in set(classes):
                counts[c] += 1
        freq = {c: cnt / n for c, cnt in counts.items()}
        cls_repeat = {
            c: max(1.0, np.sqrt(repeat_thresh / f)) for c, f in freq.items()
        }
        self.repeat = np.asarray(
            [
                max([cls_repeat[c] for c in set(cs)], default=1.0)
                for cs in record_classes
            ]
        )
        self.rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[int]:
        floor = np.floor(self.repeat).astype(int)
        frac = self.repeat - floor
        while True:
            idxs = []
            rand = self.rng.rand(len(self.repeat))
            for i, (f, fr) in enumerate(zip(floor, frac)):
                idxs.extend([i] * (f + int(rand[i] < fr)))
            order = self.rng.permutation(len(idxs))
            yield from (idxs[j] for j in order)


class GroupSampler:
    """Batch indices grouped by a key (e.g. aspect ratio) so every batch is
    homogeneous (mmdet GroupSampler)."""

    def __init__(self, group_ids: Sequence[int], batch_size: int, seed: int = 0):
        self.groups = defaultdict(list)
        for i, g in enumerate(group_ids):
            self.groups[g].append(i)
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[list]:
        while True:
            batches = []
            for members in self.groups.values():
                order = self.rng.permutation(len(members))
                shuffled = [members[i] for i in order]
                for s in range(0, len(shuffled) - self.batch_size + 1,
                               self.batch_size):
                    batches.append(shuffled[s : s + self.batch_size])
            for bi in self.rng.permutation(len(batches)):
                yield batches[bi]

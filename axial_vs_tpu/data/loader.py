"""Training data loader: background workers + device prefetch.

Replaces the reference's detectron2/mmdet dataloader stack with a pipeline
feeding the jit'd train step: workers run the mapper (decode, augment,
target building — pure numpy), a bounded queue keeps ``prefetch`` batches
ready, and ``device_prefetch`` overlaps host->HBM transfer with device
compute by keeping one batch in flight.

Workers are PROCESSES by default (``use_processes=True``), matching the
reference's detectron2/mmdet worker-process dataloaders: jpeg decode,
copy-paste, and RLE run under the GIL, so threads cannot scale them on a
real TPU host. Workers are forked (Linux) so the dataset/mapper transfer
for free and — critically — the children never re-import jax (a spawned
worker would re-run sitecustomize and open its own TPU client). Workers
must not touch jax; they produce pure numpy batches.
"""
from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np


def _stack_tree(samples):
    first = samples[0]
    if isinstance(first, dict):
        return {k: _stack_tree([s[k] for s in samples]) for k in first}
    return np.stack(samples)


class ClipDataLoader:
    """Infinite sampler over a video dataset with mapper workers."""

    def __init__(self, dataset: Sequence, mapper: Callable, batch_size: int,
                 num_workers: int = 4, prefetch: int = 2, seed: int = 0,
                 use_processes: bool = True):
        self.dataset = dataset
        self.mapper = mapper
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.use_processes = use_processes
        self._stop = threading.Event()
        self._threads = []
        self._procs = []
        if use_processes:
            self._ctx = mp.get_context("fork")
            self._mpq = self._ctx.Queue(maxsize=max(prefetch, 1))
        else:
            self._queue: queue.Queue = queue.Queue(maxsize=prefetch)

    def _make_batch(self, rng):
        n = len(self.dataset)
        idxs = rng.randint(0, n, self.batch_size)
        samples = [self.mapper(self.dataset[i], dataset=self.dataset)
                   for i in idxs]
        batch = _stack_tree(samples)
        # flatten (B, T, H, W, 3) -> (B*T, H, W, 3) for the model;
        # image mappers (COCO panoptic/instance) already yield
        # (B, H, W, 3) — leave those alone
        imgs = batch["images"]
        if imgs.ndim == 5:
            batch["images"] = imgs.reshape(-1, *imgs.shape[2:])
        return batch

    def _worker(self, wid: int):
        rng = np.random.RandomState(self.seed * 1000 + wid)
        while not self._stop.is_set():
            batch = self._make_batch(rng)
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def _proc_worker(self, wid: int):
        # runs in a forked child: numpy/PIL only, never jax
        rng = np.random.RandomState(self.seed * 1000 + wid)
        while True:
            self._mpq.put(self._make_batch(rng))

    def _start(self):
        if self.use_processes:
            for wid in range(self.num_workers):
                p = self._ctx.Process(
                    target=self._proc_worker, args=(wid,), daemon=True)
                p.start()
                self._procs.append(p)
        else:
            for wid in range(self.num_workers):
                th = threading.Thread(
                    target=self._worker, args=(wid,), daemon=True)
                th.start()
                self._threads.append(th)

    def __iter__(self) -> Iterator:
        if not self._threads and not self._procs:
            self._start()
        while True:
            yield self._mpq.get() if self.use_processes else self._queue.get()

    def close(self):
        self._stop.set()
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            p.join(timeout=2.0)
        self._procs = []


def device_prefetch(iterator, placement_fn, depth: int = 1):
    """Keep ``depth`` batches already transferred to device."""
    import collections

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(placement_fn(next(it)))
        while True:
            nxt = placement_fn(next(it))
            yield buf.popleft()
            buf.append(nxt)
    except StopIteration:
        while buf:
            yield buf.popleft()

"""Multi-host utilities: distributed init + eval gather.

Replaces the reference's rank-0 `comm.gather` of evaluator predictions
(`vipseg_evaluation.py:226-229`) and torch.distributed process-group setup:
`jax.distributed.initialize` + `multihost_utils` for cross-host array
gathers; python-object gather goes through a broadcast of serialized bytes.
"""
from __future__ import annotations

import pickle

import numpy as np
import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host init (no-op when single-process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def gather_object(obj, max_bytes: int = 1 << 28):
    """All-gather a picklable object across hosts; returns list (one per
    process). Single-process: [obj].

    Two rounds: an 8-byte size allgather first, then one buffer allgather
    padded to the LARGEST payload (all processes must agree on the array
    shape) — the transfer scales with the actual object size, not with
    ``max_bytes``."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    n = len(payload)
    assert n <= max_bytes, f"object too large to gather ({n} bytes)"
    sizes = multihost_utils.process_allgather(np.asarray([n], np.int64))
    width = int(sizes.max())
    buf = np.zeros((width,), np.uint8)
    buf[:n] = np.frombuffer(payload, np.uint8)
    datas = multihost_utils.process_allgather(buf)
    return [
        pickle.loads(datas[i, : int(sizes[i, 0])].tobytes())
        for i in range(jax.process_count())
    ]

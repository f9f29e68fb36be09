"""MiniVIS-style query tracker: embedding memory + Hungarian matching.

Re-designs `MaXTron_Tube-Link/tracker/mini_vis_tracker.py:8-79`: each clip's
query embeddings are matched to the memory by cosine-cost LSAP; unmatched
new queries open new track ids and extend the memory.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


class MiniVISTracker:
    def __init__(self):
        self.memory: np.ndarray | None = None

    def reset(self):
        self.memory = None

    def match(self, cur_embds: np.ndarray) -> np.ndarray:
        """cur_embds (N, C) -> (N,) track ids."""
        if self.memory is None:
            self.memory = np.array(cur_embds, np.float32)
            return np.arange(len(cur_embds))

        cur = cur_embds / np.maximum(
            np.linalg.norm(cur_embds, axis=1, keepdims=True), 1e-12
        )
        tgt = self.memory / np.maximum(
            np.linalg.norm(self.memory, axis=1, keepdims=True), 1e-12
        )
        cost = 1 - cur @ tgt.T
        rows, cols = linear_sum_assignment(cost.T)  # (target, current)
        new_ids = np.full(len(cur_embds), -1, np.int64)
        new_ids[cols] = rows
        unmatched = np.setdiff1d(np.arange(len(cur_embds)), cols)
        if unmatched.size:
            new_ids[unmatched] = len(self.memory) + np.arange(unmatched.size)
            self.memory = np.concatenate([self.memory, cur[unmatched]])
        assert (new_ids >= 0).all()
        return new_ids

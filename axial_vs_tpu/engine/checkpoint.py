"""Checkpointing: orbax-backed save/resume with preemption safety.

Replaces d2's DetectionCheckpointer periodic saves + ``--resume``
(`train_net_video.py:252-261`) and mmcv's ``--auto-resume``: step-numbered
checkpoints, retention, ``latest_step``-based resume, and save-on-preemption
via a simple signal hook.
"""
from __future__ import annotations

import os
import signal

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )
        self._preempted = False

    def install_preemption_hook(self):
        def handler(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM,):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass

    @property
    def preempted(self) -> bool:
        return self._preempted

    def save(self, step: int, state, force: bool = False):
        if int(step) in (self._mgr.all_steps() or ()):
            if not force:
                # re-run over an old output_dir: keep the existing
                # checkpoint, but say so — silently dropping new state at
                # an overlapping step would make a later resume restore
                # stale weights (advisor r4)
                import logging

                logging.getLogger(__name__).warning(
                    "checkpoint for step %d already exists in %s; "
                    "skipping save (pass force=True to overwrite)",
                    int(step), self.directory)
                return
            # force=True (e.g. preemption save) must win: replace the
            # existing step
            self._mgr.delete(int(step))
        self._mgr.save(
            int(step), args=ocp.args.StandardSave(state), force=force
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state_template, step: int | None = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            int(step), args=ocp.args.StandardRestore(state_template)
        )

"""Trainer: config -> data + model + optimizer + pjit'ed loop.

Replaces the reference's d2 DefaultTrainer subclass + launch()
(`train_net_video.py:50-275`): one process drives all local devices via a
'data' mesh (GSPMD handles gradient sync + SyncBN); multi-host runs
initialize ``jax.distributed`` and feed per-host shards.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ConfigNode
from ..data.build import build_mapper
from ..data.catalog import DatasetCatalog
from ..data.loader import ClipDataLoader, device_prefetch
from ..losses.criterion import SetCriterion
from ..models.build import build_model_and_criterion, criterion_from_config
from ..parallel.mesh import build_mesh
from .checkpoint import CheckpointManager
from .logger import MetricsLogger, setup_logger
from .lr_schedule import tf2_warmup_poly_lr
from .optim import build_optimizer
from .train_step import TrainState, create_train_state, make_train_step


class Trainer:
    def __init__(self, cfg: ConfigNode):
        import math

        self.cfg = cfg
        self.logger = setup_logger(output_dir=cfg.output_dir)
        # the data axis must divide the per-host video batch; use the largest
        # divisor of the batch that fits the device count
        local_videos = max(cfg.solver.ims_per_batch // jax.process_count(), 1)
        n_data = math.gcd(local_videos, jax.local_device_count())
        self.mesh = build_mesh(
            tuple(cfg.parallel.mesh_axes), devices=jax.devices()[:n_data]
        )
        if n_data != jax.local_device_count():
            self.logger.warning(
                f"batch {local_videos} not divisible by {jax.local_device_count()} "
                f"devices; using a {n_data}-device data mesh"
            )
        self.num_frames = cfg.input.num_video_frames
        self.module, self.criterion = build_model_and_criterion(cfg, train=True)

        # data
        datasets = []
        for name in cfg.datasets.train:
            datasets.extend(DatasetCatalog.get(name))
        self.dataset = datasets
        mapper = build_mapper(cfg, seed=cfg.dataloader.seed)
        local_batch = local_videos
        self.loader = (
            ClipDataLoader(
                datasets, mapper, batch_size=local_batch,
                num_workers=cfg.dataloader.num_workers,
                prefetch=cfg.dataloader.prefetch, seed=cfg.dataloader.seed,
            )
            if datasets
            else None
        )

        # optimizer/state
        rng = jax.random.PRNGKey(cfg.seed)
        t = self.num_frames
        h, w = cfg.input.image_size
        example = jnp.zeros((local_batch * t, h, w, 3), jnp.float32)
        schedule = tf2_warmup_poly_lr(
            cfg.solver.base_lr, cfg.solver.max_iter,
            warmup_iters=cfg.solver.warmup_iters, power=cfg.solver.poly_power,
        )
        variables_shape = jax.eval_shape(
            lambda: self.module.init(rng, example, train=True)
        )
        self.tx = build_optimizer(cfg, variables_shape["params"], schedule)
        self._rng = rng
        self._example = example
        self.state = None

        self.ckpt = CheckpointManager(
            os.path.join(cfg.output_dir, "checkpoints"),
            save_interval_steps=1,
        )
        self.ckpt.install_preemption_hook()
        self.metrics = MetricsLogger(cfg.output_dir)

        self._repl = NamedSharding(self.mesh, P())
        self._data = NamedSharding(self.mesh, P("data"))
        step = make_train_step(self.module, self.criterion, self.tx)
        self.train_step = jax.jit(step, donate_argnums=(0,))

    # -- state ---------------------------------------------------------------
    def init_state(self, init_weights=None):
        self.state = create_train_state(
            self.module, self._rng, self._example, self.tx
        )
        if init_weights:
            self.load_weights(init_weights)
        self.state = jax.device_put(self.state, self._repl)
        return self.state

    def load_weights(self, path):
        """Load initial weights (orbax dir or converted .npz tree)."""
        import pickle

        if os.path.isdir(path):
            restored = CheckpointManager(path).restore(self.state)
            if restored is not None:
                self.state = restored
        else:
            with open(path, "rb") as f:
                tree = pickle.load(f)
            params = self.state.params
            merged = _merge_trees(params, tree.get("params", tree))
            stats = _merge_trees(
                self.state.batch_stats, tree.get("batch_stats", {})
            )
            self.state = self.state._replace(params=merged, batch_stats=stats)
        self.logger.info(f"loaded weights from {path}")

    def resume_or_load(self, resume: bool):
        if self.state is None:
            self.init_state(self.cfg.model.weights or None)
        if resume:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = jax.device_put(restored, self._repl)
                self.logger.info(f"resumed from step {int(self.state.step)}")

    # -- loop ----------------------------------------------------------------
    def _place_batch(self, batch):
        return {
            "images": jax.device_put(batch["images"], self._data),
            "targets": {
                k: jax.device_put(v, self._data) for k, v in batch["targets"].items()
            },
        }

    def train(self, resume: bool = False, max_iter: int | None = None,
              eval_fn=None, dynamic_eval_intervals=None):
        """eval_fn(variables_dict) -> metrics dict, run every
        cfg.test.eval_period steps (the EvalHook equivalent, SURVEY T15).

        ``dynamic_eval_intervals``: [(milestone_step, interval), ...] —
        past each milestone the eval period switches to that interval
        (mmdet EvalHook ``dynamic_intervals``,
        `apis/hook/eval_hook.py:31-40`; e.g. [(9000, 500)] evaluates every
        500 steps for the final 1000 of a 10k run). Falls back to
        cfg.test.dynamic_eval_intervals when unset.
        """
        import bisect

        self.resume_or_load(resume)
        max_iter = max_iter or self.cfg.solver.max_iter
        eval_period = self.cfg.test.eval_period
        if dynamic_eval_intervals is None:
            dynamic_eval_intervals = (
                self.cfg.test.get("dynamic_eval_intervals", None) or None)
        milestones, intervals = [0], [eval_period]
        for m, iv in sorted(dynamic_eval_intervals or []):
            milestones.append(int(m))
            intervals.append(int(iv))
        start = int(self.state.step)
        it = device_prefetch(iter(self.loader), self._place_batch, depth=1)
        rng = jax.random.PRNGKey(self.cfg.seed + 1)
        with self.mesh:
            for step in range(start, max_iter):
                batch = next(it)
                rng, sub = jax.random.split(rng)
                self.state, metrics = self.train_step(self.state, batch, sub)
                if (step + 1) % self.metrics.log_every == 0 or self.ckpt.preempted:
                    self.metrics.log(step + 1, jax.device_get(metrics), self.logger)
                if (step + 1) % self.cfg.solver.checkpoint_period == 0 or (
                    step + 1
                ) == max_iter or self.ckpt.preempted:
                    self.ckpt.save(step + 1, jax.device_get(self.state), force=True)
                cur_period = intervals[
                    bisect.bisect(milestones, step + 1) - 1]
                if eval_fn is not None and (
                    (step + 1) % cur_period == 0 or (step + 1) == max_iter
                ):
                    results = eval_fn(
                        {"params": self.state.params,
                         "batch_stats": self.state.batch_stats}
                    )
                    self.logger.info(f"eval @ {step + 1}: {results}")
                if self.ckpt.preempted:
                    self.logger.warning("preemption signal: checkpoint saved, exiting")
                    break
        self.ckpt.wait()
        return self.state


def _merge_trees(base, override):
    if not isinstance(base, dict):
        return override if override is not None else base
    out = dict(base)
    for k, v in (override or {}).items():
        if k in out:
            out[k] = _merge_trees(out[k], v)
    return out

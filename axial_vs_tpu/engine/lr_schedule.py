"""LR schedules. TF2/deeplab2-exact warmup poly LR
(`train_net_utils.py:34-85`): linear warmup to base lr over warmup_iters,
then (1 - step/max)^power decay, optional constant ending."""
from __future__ import annotations

import jax.numpy as jnp


def tf2_warmup_poly_lr(base_lr: float, max_iters: int, warmup_iters: int = 1000,
                       warmup_factor: float = 0.001, power: float = 0.9,
                       constant_ending: float = 0.0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        poly = jnp.power(jnp.maximum(1.0 - step / max_iters, 0.0), power)
        lr = jnp.where(step < warmup_iters, base_lr * wf, base_lr * poly)
        if constant_ending > 0:
            lr = jnp.where(
                (step >= warmup_iters) & (poly < constant_ending),
                base_lr * constant_ending,
                lr,
            )
        return lr

    return schedule


def step_lr(base_lr: float, milestones, gamma: float = 0.1,
            warmup_iters: int = 500, warmup_ratio: float = 0.001):
    """mmcv-style step LR with linear warmup (Tube-Link schedules,
    `configs/video/_base_/schedules/mask2former_schedules_iter.py:1-32`)."""
    import numpy as np

    ms = jnp.asarray(np.asarray(sorted(milestones), np.float32))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        k = jnp.sum(step >= ms)
        lr = base_lr * (gamma ** k)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        wf = warmup_ratio * (1 - alpha) + alpha
        return jnp.where(step < warmup_iters, base_lr * wf, lr)

    return schedule

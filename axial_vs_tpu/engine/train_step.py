"""Training step: loss + grads + optimizer update, pjit-ready.

One jitted function covers the whole iteration the reference spreads over
Trainer.run_step / AMP / DDP (`train_net_video.py:229-243` call stack):
forward (train-mode BN updates), PQ criterion, weighted total, grads,
AdamW-with-rules update. Under a data-sharded batch, GSPMD inserts the
gradient all-reduce and makes every BatchNorm a cross-replica SyncBN.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(module, rng, example_images, tx):
    variables = module.init(rng, example_images, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(module, criterion, tx):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'images': (B*T, H, W, 3), 'targets': {...}} — see losses.matcher
    for the target format.
    """

    def train_step(state, batch, rng):
        rng_model, rng_loss = jax.random.split(rng)

        def loss_fn(params):
            outputs, mutated = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_model},
            )
            losses = criterion(rng_loss, outputs, batch["targets"])
            total = criterion.weighted_total(losses)
            return total, (losses, mutated.get("batch_stats", state.batch_stats))

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    return train_step

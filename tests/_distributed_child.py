"""Child process for the multi-process distributed test.

Runs as one of N processes (argv: process_id num_processes coordinator),
each owning 4 virtual CPU devices. Exercises the real multi-host path that
`tools/dist_train.sh` promises (reference `tools/dist_train.sh:12-33`
NNODES semantics): `parallel.distributed.initialize` -> global mesh over
all processes' devices -> ONE sharded train step of a small-but-real
module (Conv + BatchNorm -> mask slots/class logits) through the real
SetCriterion + auction matcher + optax, with per-process local batch
shards assembled into a global array -> `gather_object` round-trip.
Prints "child ok <loss>" on success.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from axial_vs_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid)
    assert distributed.process_count() == nprocs
    assert (distributed.is_main_process() == (pid == 0))

    import numpy as np
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from axial_vs_tpu.engine.train_step import TrainState, make_train_step
    from axial_vs_tpu.losses.criterion import SetCriterion

    devices = jax.devices()
    n_dev = len(devices)
    assert n_dev == nprocs * 4, f"expected {nprocs * 4} global devices, got {n_dev}"
    mesh = Mesh(np.asarray(devices), ("data",))

    num_classes, n_slots, m_gt, hw = 4, 8, 3, (16, 16)

    class MicroSegmenter(nn.Module):
        """Tiny but real: conv + (Sync)BatchNorm feature, per-slot mask
        logits and class logits — enough surface for criterion/matcher."""

        @nn.compact
        def __call__(self, x, train=False):
            f = nn.Conv(16, (3, 3), name="stem")(x)
            f = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="bn",
                axis_name=None)(f)
            f = nn.relu(f)
            masks = nn.Conv(n_slots, (1, 1), name="mask_head")(f)
            pooled = jnp.mean(f, axis=(1, 2))
            logits = nn.Dense(num_classes + 1, name="cls_head")(pooled)
            logits = jnp.repeat(logits[:, None, :], n_slots, axis=1)
            return {
                "pred_logits": logits,          # (B, N, C+1)
                "pred_masks": masks,            # (B, H, W, N)
            }

    module = MicroSegmenter()
    criterion = SetCriterion(
        num_classes=num_classes,
        weights={"loss_ce": 3.0, "loss_mask": 0.3, "loss_dice": 3.0},
        losses=("labels", "masks"),
        exact_matching=False,  # on-device auction: SPMD-safe, no callback
    )
    tx = optax.adamw(1e-3)

    b_global = n_dev  # one sample per device
    b_local = b_global // nprocs
    rng = jax.random.PRNGKey(0)
    init_images = jnp.zeros((b_global, *hw, 3), jnp.float32)
    variables = module.init(rng, init_images, train=True)
    state = TrainState(
        step=jnp.zeros([], jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )

    # per-process local shard -> global sharded arrays
    rs = np.random.RandomState(100 + pid)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def globalize(local):
        return jax.make_array_from_process_local_data(data, local)

    local_batch = {
        "images": rs.rand(b_local, *hw, 3).astype(np.float32),
        "targets": {
            "labels": rs.randint(0, num_classes, (b_local, m_gt)),
            "masks": (rs.rand(b_local, m_gt, *hw) > 0.6).astype(np.float32),
            "valid": np.ones((b_local, m_gt), bool),
        },
    }
    batch = jax.tree.map(globalize, local_batch)
    state = jax.device_put(state, repl)

    train_step = make_train_step(module, criterion, tx)
    batch_sharding = jax.tree.map(
        lambda _: data, local_batch,
        is_leaf=lambda x: not isinstance(x, dict))
    with mesh:
        step_fn = jax.jit(
            train_step,
            in_shardings=(repl, batch_sharding, repl),
            out_shardings=(repl, repl),
        )
        hlo = step_fn.lower(state, batch, jax.random.PRNGKey(1)).compile()
        assert "all-reduce" in hlo.as_text(), "no cross-device all-reduce"
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(new_state.params)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), loss

    # gather_object round-trip (the evaluator's prediction gather path)
    gathered = distributed.gather_object(
        {"pid": pid, "loss": loss, "blob": b"x" * (1000 + 100 * pid)})
    assert len(gathered) == nprocs
    assert [g["pid"] for g in gathered] == list(range(nprocs))
    assert all(abs(g["loss"] - loss) < 1e-6 for g in gathered), gathered
    assert len(gathered[-1]["blob"]) == 1000 + 100 * (nprocs - 1)

    print(f"child ok {loss:.4f}", flush=True)


if __name__ == "__main__":
    main()

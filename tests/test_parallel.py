"""Sharding utilities: constrain() on 1-D and 2-D meshes, distributed gather."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from axial_vs_tpu.parallel.mesh import build_mesh, shard_batch, replicate
from axial_vs_tpu.parallel.sharding import activation_sharding, constrain
from axial_vs_tpu.parallel.distributed import gather_object, is_main_process

import pytest as _pytest

pytestmark = _pytest.mark.parity


def test_constrain_noop_without_mesh():
    x = jnp.ones((4, 8))
    assert constrain(x, "data", "model") is x


def test_constrain_2d_mesh_matmul():
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))

    w = jnp.ones((16, 32))
    x = jnp.ones((8, 16))

    def f(x, w):
        y = constrain(x @ w, "data", "model")
        return jnp.sum(y ** 2)

    with mesh, activation_sharding(mesh):
        out = jax.jit(f)(
            jax.device_put(x, NamedSharding(mesh, P("data", None))),
            jax.device_put(w, NamedSharding(mesh, P())),
        )
    assert float(out) == 8 * 32 * 16 ** 2


def test_constrain_drops_missing_axes():
    mesh = build_mesh(("data",), devices=jax.devices()[:4])

    def f(x):
        return constrain(x, "data", None, "model")  # 'model' absent -> dropped

    with mesh, activation_sharding(mesh):
        y = jax.jit(f)(jnp.ones((4, 3, 8)))
    assert y.shape == (4, 3, 8)


def test_mesh_helpers():
    mesh = build_mesh(("data",), devices=jax.devices())
    batch = {"x": np.ones((8, 4), np.float32)}
    placed = shard_batch(mesh, batch)
    assert placed["x"].sharding.spec == P("data")
    repl = replicate(mesh, {"w": np.ones((3,), np.float32)})
    assert repl["w"].sharding.spec == P()


def test_gather_object_single_process():
    assert gather_object({"a": 1}) == [{"a": 1}]
    assert is_main_process()

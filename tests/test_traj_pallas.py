"""Fused trajectory-attention kernel (ops/traj_pallas.py) parity.

The kernel replaces the middle section of
`layers/trajectory_attention.TrajectoryAttention` (reference semantics:
`MaXTron_Video-kMaX/maxtron_deeplab/modeling/within_clip_tracking_module/
temporal_attention.py:20-220`) on TPU. Oracle chain:
module XLA path == _traj_math (bit-exact, pinned here) == kernel
(interpret on CPU, real Mosaic on TPU, accumulation-order tolerance).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from axial_vs_tpu.layers.trajectory_attention import TrajectoryAttention
from axial_vs_tpu.ops.traj_pallas import (
    _traj_math,
    fused_trajectory_attention,
)


def _mk(rng, b, f, n, h, d):
    c = h * d
    N = f * n
    q = jnp.asarray(rng.randn(b, N, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, N, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, N, c).astype(np.float32))
    wq2 = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05)
    bq2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
    wkv2 = jnp.asarray(rng.randn(c, 2 * c).astype(np.float32) * 0.05)
    bkv2 = jnp.asarray(rng.randn(2 * c).astype(np.float32) * 0.05)
    return q, k, v, wq2, bq2, wkv2, bkv2


def test_traj_math_matches_module_exactly(rng):
    """_traj_math == the module's middle section, bit-exact — it is both
    the kernel's oracle and its VJP rule."""
    b, f, n, h = 2, 2, 20, 8
    dim = 256
    d = dim // h
    x = jnp.asarray(rng.randn(b, f * n, dim).astype(np.float32))
    kq = jnp.asarray(rng.randn(b, f * n, dim).astype(np.float32))
    mod = TrajectoryAttention(dim=dim, num_heads=h)
    vs = mod.init(jax.random.PRNGKey(0), kq, kq, x, num_frames=f)
    want = mod.apply(vs, kq, kq, x, num_frames=f)
    p = vs["params"]
    q = jnp.dot(kq, p["q"]["kernel"]) + p["q"]["bias"]
    k = jnp.dot(kq, p["k"]["kernel"]) + p["k"]["bias"]
    v = jnp.dot(x, p["v"]["kernel"]) + p["v"]["bias"]
    mid = _traj_math(
        q, k, v, p["proj_q"]["kernel"], p["proj_q"]["bias"],
        p["proj_kv"]["kernel"], p["proj_kv"]["bias"], f, h, d ** -0.5)
    got = jnp.dot(mid, p["proj"]["kernel"]) + p["proj"]["bias"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("b,f,n,h,d", [(3, 5, 23, 8, 32), (2, 2, 43, 8, 32)])
def test_fused_kernel_interpret_matches_math(rng, b, f, n, h, d):
    args = _mk(rng, b, f, n, h, d)
    want = _traj_math(*args, f, h, d ** -0.5)
    got = fused_trajectory_attention(*args, f, h, d ** -0.5, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_fused_kernel_grads_match_math(rng):
    """custom_vjp backward (interpret forward) == autodiff of the math."""
    b, f, n, h, d = 2, 2, 11, 4, 32
    args = _mk(rng, b, f, n, h, d)

    def loss_math(*a):
        o = _traj_math(*a, f, h, d ** -0.5)
        return jnp.sum(o * jnp.sin(o))

    def loss_kern(*a):
        o = fused_trajectory_attention(*a, f, h, d ** -0.5, True)
        return jnp.sum(o * jnp.sin(o))

    g0 = jax.grad(loss_math, argnums=tuple(range(7)))(*args)
    g1 = jax.grad(loss_kern, argnums=tuple(range(7)))(*args)
    for a, bb in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=5e-3, atol=5e-3)


def test_module_param_tree_identical_under_fused_gate(rng, monkeypatch):
    """The fused path declares the SAME param tree (names, shapes,
    dtypes) as the XLA path — checkpoints are interchangeable."""
    b, f, n, h = 1, 2, 8, 8
    dim = 256
    x = jnp.asarray(rng.randn(b, f * n, dim).astype(np.float32))
    mod = TrajectoryAttention(dim=dim, num_heads=h)
    monkeypatch.setenv("AXIALVS_FUSED_TRAJ", "0")
    vs0 = mod.init(jax.random.PRNGKey(0), x, x, x, num_frames=f)
    monkeypatch.setenv("AXIALVS_FUSED_TRAJ", "1")
    vs1 = mod.init(jax.random.PRNGKey(0), x, x, x, num_frames=f)
    t0 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vs0)
    t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), vs1)
    assert t0 == t1
    # identical VALUES too (same name paths -> same init streams)
    for a, bb in zip(jax.tree.leaves(vs0), jax.tree.leaves(vs1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-kernel parity needs the chip")
def test_fused_kernel_tpu_matches_math():
    rng = np.random.RandomState(0)
    for b, f, n, h, d in [(3, 5, 23, 8, 32), (2, 2, 43, 8, 32)]:
        args = _mk(rng, b, f, n, h, d)
        want = _traj_math(*args, f, h, d ** -0.5)
        got = fused_trajectory_attention(*args, f, h, d ** -0.5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-kernel parity needs the chip")
def test_module_fused_matches_xla_tpu():
    """Whole-module check on the chip: fused gate on vs off."""
    rng = np.random.RandomState(1)
    b, f, n, h = 2, 2, 20, 8
    dim = 256
    x = jnp.asarray(rng.randn(b, f * n, dim).astype(np.float32))
    kq = jnp.asarray(rng.randn(b, f * n, dim).astype(np.float32))
    mod = TrajectoryAttention(dim=dim, num_heads=h)
    import os

    os.environ["AXIALVS_FUSED_TRAJ"] = "0"
    try:
        vs = mod.init(jax.random.PRNGKey(0), kq, kq, x, num_frames=f)
        want = mod.apply(vs, kq, kq, x, num_frames=f)
        os.environ["AXIALVS_FUSED_TRAJ"] = "1"
        got = mod.apply(vs, kq, kq, x, num_frames=f)
    finally:
        os.environ.pop("AXIALVS_FUSED_TRAJ", None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3)

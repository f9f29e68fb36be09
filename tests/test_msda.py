"""MSDA op vs a torch grid_sample oracle (the reference's own test strategy:
the pure-pytorch fallback is the ground truth for the native kernel,
SURVEY.md §4 / ops test.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from axial_vs_tpu.ops.msda import ms_deform_attn

import pytest as _pytest

pytestmark = _pytest.mark.parity


def torch_msda_oracle(value, spatial_shapes, locs, weights):
    """Independent torch implementation via grid_sample: value (B,S,M,D),
    locs (B,Lq,M,L,P,2) in [0,1], weights (B,Lq,M,L,P). Accepts numpy or
    torch tensors (tensors keep autograd — the gradient-oracle path, the
    reference's own gradcheck strategy for its CUDA kernel, ops/test.py)."""
    value_t, locs, weights = (
        x if torch.is_tensor(x) else torch.from_numpy(x)
        for x in (value, locs, weights))
    b, s, m, d = value_t.shape
    _, lq, _, L, p, _ = locs.shape
    out = torch.zeros(b, lq, m, d, dtype=torch.float64)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, start : start + h * w]  # (B, HW, M, D)
        start += h * w
        # (B*M, D, H, W)
        v = v.permute(0, 2, 3, 1).reshape(b * m, d, h, w)
        grid = locs[:, :, :, lvl] * 2 - 1  # (B, Lq, M, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * m, lq, p, 2)
        sampled = TF.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*M, D, Lq, P)
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3).reshape(
            b * m, 1, lq, p
        )
        contrib = (sampled * wgt).sum(-1)  # (B*M, D, Lq)
        out = out + contrib.reshape(b, m, d, lq).permute(0, 3, 1, 2)
    out = out.reshape(b, lq, m, d).reshape(b, lq, m * d)
    return out if value_t.requires_grad or locs.requires_grad else out.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_matches_torch_oracle(seed):
    rng = np.random.RandomState(seed)
    b, m, d, p = 2, 4, 8, 4
    spatial_shapes = ((6, 9), (3, 5), (2, 3))
    s = sum(h * w for h, w in spatial_shapes)
    lq = 17
    L = len(spatial_shapes)
    value = rng.randn(b, s, m, d).astype(np.float64)
    # locations straddle in/out-of-bounds to exercise zero padding
    locs = (rng.rand(b, lq, m, L, p, 2) * 1.4 - 0.2).astype(np.float64)
    weights = rng.rand(b, lq, m, L, p).astype(np.float64)
    weights /= weights.reshape(b, lq, m, -1).sum(-1, keepdims=True).reshape(
        b, lq, m, 1, 1
    )

    ref = torch_msda_oracle(value, spatial_shapes, locs, weights)
    got = ms_deform_attn(
        jnp.asarray(value.astype(np.float32)),
        spatial_shapes,
        jnp.asarray(locs.astype(np.float32)),
        jnp.asarray(weights.astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_vjp_matches_torch_autograd(seed):
    """Backward-pass oracle (VERDICT r3 #5): the XLA-autodiff VJP of
    ms_deform_attn must match torch autograd through the grid_sample
    oracle — the reference gradchecks its CUDA kernel the same way
    (MaXTron_Video-kMaX/kmax_deeplab/modeling/spatial_encoder/ops/
    test.py:34-50). Locations are kept off bilinear cell boundaries
    (where the derivative has measure-zero kinks) by construction."""
    rng = np.random.RandomState(100 + seed)
    b, m, d, p = 2, 2, 6, 3
    spatial_shapes = ((5, 7), (3, 4))
    L = len(spatial_shapes)
    s = sum(h * w for h, w in spatial_shapes)
    lq = 9
    value = rng.randn(b, s, m, d)
    # interior + a few clearly-out-of-bounds points; nudge off exact
    # gridlines so torch/XLA subgradient choices can't differ
    locs = rng.rand(b, lq, m, L, p, 2) * 1.3 - 0.15
    locs += 1e-3 * np.sign(rng.randn(*locs.shape))
    weights = rng.rand(b, lq, m, L, p)
    weights /= weights.reshape(b, lq, m, -1).sum(-1, keepdims=True).reshape(
        b, lq, m, 1, 1)
    cot = rng.randn(b, lq, m * d)

    vt = torch.tensor(value, requires_grad=True)
    lt = torch.tensor(locs, requires_grad=True)
    wt = torch.tensor(weights, requires_grad=True)
    out_t = torch_msda_oracle(vt, spatial_shapes, lt, wt)
    out_t.backward(torch.from_numpy(cot))

    def f(v, l, w):
        out = ms_deform_attn(v, spatial_shapes, l, w)
        return jnp.sum(out * jnp.asarray(cot, jnp.float32))

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value, jnp.float32),
        jnp.asarray(locs, jnp.float32),
        jnp.asarray(weights, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(gv), vt.grad.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gl), lt.grad.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(gw), wt.grad.numpy(), rtol=2e-3, atol=2e-4)


def test_msda_grads_finite():
    rng = np.random.RandomState(0)
    b, m, d, p = 1, 2, 4, 2
    spatial_shapes = ((4, 4), (2, 2))
    s = sum(h * w for h, w in spatial_shapes)
    lq = 5
    value = jnp.asarray(rng.randn(b, s, m, d).astype(np.float32))
    locs = jnp.asarray(rng.rand(b, lq, m, 2, p, 2).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, lq, m, 2, p).astype(np.float32))

    def f(v, l, w):
        return jnp.sum(ms_deform_attn(v, spatial_shapes, l, w) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, weights)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def test_weighted_corner_reduce_ref_contract(rng):
    """The Pallas kernel's jnp reference implements the documented contract
    (the kernel itself is TPU-only; parity kernel<->ref is exercised by
    AXIALVS_MSDA_PALLAS=1 runs of tools/bench_msda.py on hardware)."""
    import jax.numpy as jnp
    from axial_vs_tpu.ops.msda_pallas import weighted_corner_reduce_ref

    r, s, d = 6, 5, 8
    g = jnp.asarray(rng.randn(r, s, 4 * d).astype(np.float32))
    w = jnp.asarray(rng.randn(r, s * 4).astype(np.float32))
    out = weighted_corner_reduce_ref(g, w)
    want = np.einsum(
        "rskd,rsk->rd",
        np.asarray(g).reshape(r, s, 4, d),
        np.asarray(w).reshape(r, s, 4),
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_pack_corner_table_matches_roll_build(rng):
    """Interpret-mode Pallas pack == the jnp.roll table build on every
    non-wrapped lane (wrapped lanes are zero-weighted by the consumer and
    intentionally differ: roll wraps, the kernel zero-pads/clamps), and is
    finite everywhere."""
    from axial_vs_tpu.ops.msda_pallas import (pack_corner_table,
                                              pack_corner_table_ref)

    b, h, w, n_heads, d = 2, 9, 7, 2, 8
    s, md = h * w, n_heads * d
    v = jnp.asarray(rng.randn(b, s, md).astype(np.float32))
    got = np.asarray(pack_corner_table(
        v, width=w, n_heads=n_heads, block_rows=16, interpret=True))
    want = np.asarray(pack_corner_table_ref(v, width=w, n_heads=n_heads))
    assert np.isfinite(got).all()
    offs = (0, 1, w, w + 1)
    for m in range(n_heads):
        for k, off in enumerate(offs):
            lanes = slice((m * 4 + k) * d, (m * 4 + k + 1) * d)
            valid = s - off  # rows whose roll did NOT wrap
            np.testing.assert_allclose(
                got[:, :valid, lanes], want[:, :valid, lanes], rtol=1e-6,
                err_msg=f"m={m} k={k}")


def test_v4_math_contract(rng):
    """_v4_math (the VJP rule of the differentiable v4 reduce) implements
    the kernel's documented contract for both column orders."""
    from axial_vs_tpu.ops.msda_pallas import _v4_math

    r, n, d = 6, 3, 8
    gs = tuple(jnp.asarray(rng.randn(r, 4 * d).astype(np.float32))
               for _ in range(n))
    w = jnp.asarray(rng.randn(r, n * 4).astype(np.float32))
    for slot_major in (False, True):
        got = np.asarray(_v4_math(gs, w, slot_major))
        want = np.zeros((r, d), np.float32)
        for si in range(n):
            for k in range(4):
                col = k * n + si if slot_major else si * 4 + k
                want += (np.asarray(gs[si])[:, k * d:(k + 1) * d]
                         * np.asarray(w)[:, col][:, None])
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="v4 kernel is TPU-only")
def test_msda_pallas_grads_match_xla_tpu():
    """Training through the Pallas fast path (weighted_corner_reduce_v4_ad,
    VERDICT r4 #4): value AND gradients of ms_deform_attn with
    pallas_reduce=True match the XLA accumulate path on the real chip.
    d=32 so the (4*d)%128==0 kernel gate opens."""
    rng = np.random.RandomState(0)
    b, m, d, p = 1, 2, 32, 2
    spatial_shapes = ((6, 5), (3, 3))
    s = sum(h * w for h, w in spatial_shapes)
    lq = 7
    value = jnp.asarray(rng.randn(b, s, m, d).astype(np.float32))
    locs = jnp.asarray(rng.rand(b, lq, m, 2, p, 2).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, lq, m, 2, p).astype(np.float32))

    def f(pallas):
        def g(v, l, w):
            out = ms_deform_attn(v, spatial_shapes, l, w,
                                 pallas_reduce=pallas)
            return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent
        return g

    v0, grads0 = jax.value_and_grad(f(False), argnums=(0, 1, 2))(
        value, locs, weights)
    v1, grads1 = jax.value_and_grad(f(True), argnums=(0, 1, 2))(
        value, locs, weights)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=2e-2, atol=2e-2)
    for g0, g1 in zip(grads0, grads1):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=5e-2, atol=5e-2)

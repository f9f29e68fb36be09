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
    locs (B,Lq,M,L,P,2) in [0,1], weights (B,Lq,M,L,P)."""
    b, s, m, d = value.shape
    _, lq, _, L, p, _ = locs.shape
    value_t = torch.from_numpy(value)
    out = torch.zeros(b, lq, m, d, dtype=torch.float64)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, start : start + h * w]  # (B, HW, M, D)
        start += h * w
        # (B*M, D, H, W)
        v = v.permute(0, 2, 3, 1).reshape(b * m, d, h, w)
        grid = torch.from_numpy(locs[:, :, :, lvl]) * 2 - 1  # (B, Lq, M, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * m, lq, p, 2)
        sampled = TF.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*M, D, Lq, P)
        wgt = torch.from_numpy(weights[:, :, :, lvl]).permute(0, 2, 1, 3).reshape(
            b * m, 1, lq, p
        )
        contrib = (sampled * wgt).sum(-1)  # (B*M, D, Lq)
        out += contrib.reshape(b, m, d, lq).permute(0, 3, 1, 2)
    return out.reshape(b, lq, m, d).reshape(b, lq, m * d).numpy()


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

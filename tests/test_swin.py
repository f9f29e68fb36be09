"""Swin backbone tests: shapes, shifted-window masks, window round-trip."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.models.backbones.swin import (

    SwinTransformer, window_partition, window_reverse, shifted_window_mask,
    relative_position_index,
)


import pytest as _pytest

pytestmark = _pytest.mark.parity


def test_window_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 14, 28, 8).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 4, 49, 8)
    back = window_reverse(w, 7, 14, 28)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # symmetric positions map to mirrored indices
    assert idx[0, 8] + idx[8, 0] == 2 * idx[0, 0]


def test_shifted_mask_blocks_cross_region():
    m = shifted_window_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert m[0].sum() == 0  # interior window has one region
    assert m[-1].sum() > 0  # corner window mixes regions


def test_swin_features(rng):
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 2, 1),
                            num_heads=(2, 2, 4, 4), window_size=4)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vs, x, train=False)
    assert out["res2"].shape == (1, 16, 24, 32)
    assert out["res3"].shape == (1, 8, 12, 64)
    assert out["res4"].shape == (1, 4, 6, 128)
    assert out["res5"].shape == (1, 2, 3, 256)
    # odd sizes (padding path)
    x2 = jnp.asarray(rng.randn(1, 52, 68, 3).astype(np.float32))
    out2 = model.apply(vs, x2, train=False)
    assert out2["res2"].shape == (1, 13, 17, 32)
    assert np.isfinite(np.asarray(out2["res5"])).all()

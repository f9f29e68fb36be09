"""Within-clip tracking module + full WC segmenter smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.models.wc_module import WithinClipTrackingModule
from axial_vs_tpu.layers.msda_attention import (
    MSDeformAttn, reference_points_for_shapes,
)


def test_reference_points():
    pts = reference_points_for_shapes(((2, 3), (1, 2)))
    assert pts.shape == (8, 2, 2)
    # first token of level 0: center of pixel (0,0) normalized
    np.testing.assert_allclose(pts[0, 0], [0.5 / 3, 0.5 / 2])
    # level-1 tokens replicate their own centers across level dims
    np.testing.assert_allclose(pts[6, 1], [0.25, 0.5])


def test_msdeform_attn_zero_init_is_local_average(rng):
    """With zero-init offsets/weights, each query attends with uniform
    weights at grid-offset sample points — output must be finite and
    value-dependent."""
    shapes = ((4, 6), (2, 3))
    s = sum(h * w for h, w in shapes)
    m = MSDeformAttn(d_model=16, n_levels=2, n_heads=4, n_points=2)
    x = jnp.asarray(rng.randn(2, s, 16).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, x, shapes)
    y = m.apply(vs, x, x, shapes)
    assert y.shape == (2, s, 16)
    assert np.isfinite(np.asarray(y)).all()
    y2 = m.apply(vs, x, x * 2, shapes)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_wc_module_shapes(rng):
    t = 2
    feats = {
        "res3": jnp.asarray(rng.randn(2 * t, 8, 12, 64).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(2 * t, 4, 6, 128).astype(np.float32)),
        "res5": jnp.asarray(rng.randn(2 * t, 2, 3, 256).astype(np.float32)),
    }
    m = WithinClipTrackingModule(
        conv_dims=32, nheads=4, dim_feedforward=64, num_stages=2,
        spatial_layers=2, temporal_layers=2, num_frames=t,
    )
    vs = m.init(jax.random.PRNGKey(0), feats, train=False)
    out, h_attn, w_attn = m.apply(vs, feats, train=False)
    for k in feats:
        assert out[k].shape == feats[k].shape
        assert not np.allclose(np.asarray(out[k]), np.asarray(feats[k]))
    # temporal encoder params shared across levels within a stage
    p = vs["params"]
    assert "temporal_encoder0" in p and "temporal_encoder1" in p
    assert "spatial_layer0" in p and "spatial_layer1" in p


def test_wc_module_spatial_only(rng):
    """Image pretrain variant (V28): temporal_layers=0."""
    feats = {
        "res3": jnp.asarray(rng.randn(2, 8, 12, 64).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(2, 4, 6, 128).astype(np.float32)),
        "res5": jnp.asarray(rng.randn(2, 2, 3, 256).astype(np.float32)),
    }
    m = WithinClipTrackingModule(
        conv_dims=32, nheads=4, dim_feedforward=64, num_stages=2,
        spatial_layers=2, temporal_layers=0, num_frames=1,
    )
    vs = m.init(jax.random.PRNGKey(0), feats, train=False)
    out, _, _ = m.apply(vs, feats, train=False)
    assert out["res5"].shape == feats["res5"].shape

"""Shape/invariant tests for the kMaX model stack on tiny inputs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from axial_vs_tpu.layers.axial_attention import AxialAttention, AxialAttention2D
from axial_vs_tpu.layers.kmax_layers import (
    KMaXPredictor, KMaXTransformerLayer, add_bias_towards_void,
)
from axial_vs_tpu.models.backbones.resnet import ResNet
from axial_vs_tpu.models.backbones.convnext import ConvNeXt
from axial_vs_tpu.models.pixel_decoder import KMaXPixelDecoder
from axial_vs_tpu.models.transformer_decoder import KMaXTransformerDecoder


def test_axial_attention_shapes(rng):
    m = AxialAttention(query_shape=9, total_key_depth=16, total_value_depth=32, num_heads=4)
    x = jnp.asarray(rng.randn(6, 9, 24).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (6, 9, 32)
    # RPE table is shared across positions
    assert vs["params"]["query_rpe"]["embeddings"].shape == (509, 4)


def test_axial_attention_2d_shapes(rng):
    m = AxialAttention2D(query_shape=(5, 7), filters=16, num_heads=4)
    x = jnp.asarray(rng.randn(2, 5, 7, 24).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (2, 5, 7, 32)


def test_add_bias_towards_void():
    logits = jnp.zeros((2, 3, 5))
    out = add_bias_towards_void(logits)
    np.testing.assert_allclose(np.asarray(out[..., :-1]), 0.0)
    # log((C-1) * 0.9 / 0.1) for C=5
    np.testing.assert_allclose(np.asarray(out[..., -1]), np.log(36.0), rtol=1e-6)


def test_kmax_predictor_outputs(rng):
    m = KMaXPredictor(num_classes=12)
    pixel = jnp.asarray(rng.randn(2, 8, 10, 32).astype(np.float32))
    emb = jnp.asarray(rng.randn(2, 16, 256).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), emb, emb, pixel, train=False)
    out = m.apply(vs, emb, emb, pixel, train=False)
    assert out["class_logits"].shape == (2, 16, 12)
    assert out["mask_logits"].shape == (2, 8, 10, 16)
    assert out["pixel_feature"].shape == (2, 8, 10, 128)
    # pixel features are L2-normalized over channels
    norms = np.linalg.norm(np.asarray(out["pixel_feature"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_kmax_transformer_layer(rng):
    m = KMaXTransformerLayer(num_classes=12)
    pixel = jnp.asarray(rng.randn(2, 6, 7, 64).astype(np.float32))
    query = jnp.asarray(rng.randn(2, 16, 256).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), pixel, query, train=False)
    q2, pred = m.apply(vs, pixel, query, train=False)
    assert q2.shape == (2, 16, 256)
    assert pred["mask_logits"].shape == (2, 6, 7, 16)


@pytest.mark.parametrize("depth", [50])
def test_resnet_features(rng, depth):
    m = ResNet(depth=depth)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vs, x, train=False)
    assert out["res2"].shape == (1, 16, 24, 256)
    assert out["res3"].shape == (1, 8, 12, 512)
    assert out["res4"].shape == (1, 4, 6, 1024)
    assert out["res5"].shape == (1, 2, 3, 2048)


def test_convnext_features(rng):
    m = ConvNeXt(depths=(2, 2, 2, 2), dims=(32, 64, 96, 128))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vs, x, train=False)
    assert out["res2"].shape == (1, 16, 16, 32)
    assert out["res5"].shape == (1, 2, 2, 128)


def test_convnext_stem_s2d_matches_conv(rng):
    """_StemS2D == nn.Conv(F, (4,4), strides=(4,4), padding=VALID) — the
    reference stem's torch-default semantics (`kmax_deeplab/modeling/
    backbone/convnext.py:106-108`): trailing partial windows are DROPPED
    at non-multiple-of-4 sizes (769x1345 -> 192x336), they are not padded
    (the round-4 SAME version diverged from the reference there)."""
    from flax import linen as nn

    from axial_vs_tpu.models.backbones.convnext import _StemS2D

    for h, w in [(64, 64), (33, 47), (65, 96)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        stem = _StemS2D(24)
        vs = stem.init(jax.random.PRNGKey(1), x)
        conv = nn.Conv(24, (4, 4), strides=(4, 4), padding="VALID")
        got = stem.apply(vs, x)
        assert got.shape == (2, h // 4, w // 4, 24)
        want = conv.apply(
            {"params": {"kernel": vs["params"]["kernel"],
                        "bias": vs["params"]["bias"]}}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pixel_decoder_and_transformer_decoder(rng):
    # tiny fake backbone features for a 64x64 input
    feats = {
        "res5": jnp.asarray(rng.randn(2, 2, 2, 512).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(2, 4, 4, 256).astype(np.float32)),
        "res3": jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32)),
        "res2": jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32)),
    }
    dec = KMaXPixelDecoder(
        dec_layers=(1, 1, 1, 1), dec_channels=(32, 24, 16, 8), spatial_shape=(64, 64)
    )
    vs = dec.init(jax.random.PRNGKey(0), feats, train=False)
    pano, sem, ms = dec.apply(vs, feats, train=False)
    assert pano.shape == (2, 16, 16, 8 * 4)
    assert [m.shape[-1] for m in ms] == [32 * 4, 24 * 4, 16 * 4]
    assert ms[0].shape[1:3] == (2, 2) and ms[2].shape[1:3] == (8, 8)

    tdec = KMaXTransformerDecoder(num_classes=12, dec_layers=(1, 1, 1), num_queries=16)
    vs2 = tdec.init(jax.random.PRNGKey(1), ms, pano, sem, train=False)
    out = tdec.apply(vs2, ms, pano, sem, train=False)
    assert out["pred_logits"].shape == (2, 16, 13)
    assert out["pred_masks"].shape == (2, 16, 16, 16)
    assert len(out["aux_outputs"]) == 3
    for aux in out["aux_outputs"]:
        assert aux["pred_masks"].shape == (2, 16, 16, 16)


def test_video_transformer_decoder(rng):
    t = 2
    feats_ms = [
        jnp.asarray(rng.randn(2 * t, 2, 2, 64).astype(np.float32)),
        jnp.asarray(rng.randn(2 * t, 4, 4, 48).astype(np.float32)),
        jnp.asarray(rng.randn(2 * t, 8, 8, 32).astype(np.float32)),
    ]
    pano = jnp.asarray(rng.randn(2 * t, 16, 16, 24).astype(np.float32))
    sem = [
        jnp.asarray(rng.randn(2 * t, 2, 2, 128).astype(np.float32)),
        jnp.asarray(rng.randn(2 * t, 8, 8, 64).astype(np.float32)),
        jnp.asarray(rng.randn(2 * t, 16, 16, 32).astype(np.float32)),
    ]
    tdec = KMaXTransformerDecoder(
        num_classes=12, dec_layers=(1, 1, 1), num_queries=16, num_frames=t
    )
    vs = tdec.init(jax.random.PRNGKey(1), feats_ms, pano, sem, train=False)
    out = tdec.apply(vs, feats_ms, pano, sem, train=False)
    assert out["pred_masks"].shape == (2, t, 16, 16, 16)
    assert out["pred_mask_embeddings"].shape == (2, 16, 128)  # mask kernels
    assert out["cluster_centers"].shape == (2, 16, 256)
    for aux in out["aux_outputs"]:
        assert aux["pred_masks"].shape == (2, t, 16, 16, 16)


def test_axial_attention_eval_fold_matches_bn(rng):
    """The eval fast path folds the similarity/retrieved BatchNorms into
    scaled einsum operands; with RANDOMIZED running stats it must match the
    unfolded BN semantics (the head_batched branch keeps the original
    concat->BN->sum path and shares the exact same variable tree)."""
    folded = AxialAttention(
        query_shape=9, total_key_depth=16, total_value_depth=32, num_heads=4)
    unfolded = AxialAttention(
        query_shape=9, total_key_depth=16, total_value_depth=32, num_heads=4,
        head_batched=True)
    x = jnp.asarray(rng.randn(6, 9, 24).astype(np.float32))
    vs = folded.init(jax.random.PRNGKey(0), x, train=False)
    # same tree either way (checkpoint compat between the two paths)
    vs2 = jax.eval_shape(lambda: unfolded.init(
        jax.random.PRNGKey(0), x, train=False))
    assert jax.tree.map(lambda s: s.shape, vs2) == jax.tree.map(
        lambda a: a.shape, vs)
    # randomize every BN param + running stat
    cnt = [0]

    def rnd(a):
        cnt[0] += 1
        return jnp.asarray(
            np.abs(rng.randn(*a.shape)).astype(np.float32) + 0.1
            if a.ndim else a)

    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree.map(rnd, vs["batch_stats"]),
    }
    vs["params"] = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.5)
        if a.ndim == 1 else a, vs["params"])
    assert cnt[0] >= 6
    y_fold = folded.apply(vs, x, train=False)
    y_bn = unfolded.apply(vs, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_fold), np.asarray(y_bn), rtol=2e-4, atol=2e-4)

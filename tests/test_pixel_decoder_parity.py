"""Full kMaX pixel decoder parity vs the reference torch module: axial +
bottleneck block groups, shortcuts, ResizedFuse upsampling, input norms."""
import numpy as np
import jax.numpy as jnp
import torch

from reference_shims import load_kmax_pixel_decoder
from axial_vs_tpu.models.pixel_decoder import KMaXPixelDecoder
from test_kmax_parity import _bn, _convbn, _randomize_bn_stats

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _ln(tl):
    return {"scale": jnp.asarray(tl.weight.detach().numpy()),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _axial_attention(ref):
    qkv_p, _ = _convbn(ref.qkv_transform, has_norm=False)
    params, stats = {}, {}
    params["qkv_transform"] = qkv_p
    for name, bn in (
        ("batch_norm_qkv", ref._batch_norm_qkv),
        ("batch_norm_similarity", ref._batch_norm_similarity),
        ("batch_norm_retrieved_output", ref._batch_norm_retrieved_output),
    ):
        p, s = _bn(bn)
        params[name] = p
        stats[name] = s
    for name, rpe in (
        ("query_rpe", ref._query_rpe), ("key_rpe", ref._key_rpe),
        ("value_rpe", ref._value_rpe),
    ):
        params[name] = {
            "embeddings": jnp.asarray(rpe._embeddings.weight.detach().numpy())
        }
    return params, stats


def _single_block(ref):
    params, stats = {}, {}

    def put(name, cb):
        p, s = _convbn(cb)
        params[name] = p
        if s:
            stats[name] = s

    put("conv1_bn_act", ref._conv1_bn_act)
    if ref._block_type == "axial":
        hp, hs = _axial_attention(ref._attention._height_axis)
        wp, ws = _axial_attention(ref._attention._width_axis)
        params["attention"] = {"height_axis": hp, "width_axis": wp}
        stats["attention"] = {"height_axis": hs, "width_axis": ws}
    else:
        put("conv2_bn_act", ref._conv2_bn_act)
    put("conv3_bn", ref._conv3_bn)
    if ref._shortcut is not None:
        put("shortcut", ref._shortcut)
    return params, stats


def test_pixel_decoder_matches_reference(rng):
    ref_mod = load_kmax_pixel_decoder()
    torch.manual_seed(0)
    from reference_shims import _install_stubs
    import sys

    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec
    input_shape = {
        "res2": ShapeSpec(32, 4), "res3": ShapeSpec(64, 8),
        "res4": ShapeSpec(128, 16), "res5": ShapeSpec(256, 32),
    }
    ref = ref_mod.kMaXPixelDecoder(
        input_shape=input_shape,
        dec_layers=[1, 2, 1, 1],
        dec_channels=[32, 24, 16, 8],
        layer_types=["axial", "axial", "bottleneck", "bottleneck"],
        drop_path_prob=0.0,
        spatial_shape=[64, 96],
    ).eval()
    _randomize_bn_stats(ref, rng)

    params, stats = {}, {}
    for i in range(4):
        params[f"in_norm{i}"] = _ln(ref._in_norms[i])
        stage_p, stage_s = {}, {}
        for j, blk in enumerate(ref._stages[i]._blocks):
            p, s = _single_block(blk)
            stage_p[f"block{j}"] = p
            if s:
                stage_s[f"block{j}"] = s
        params[f"stage{i}"] = stage_p
        stats[f"stage{i}"] = stage_s
    for i, fuse in enumerate(ref._resized_fuses):
        p, s = {}, {}
        if hasattr(fuse, "_conv_bn_low"):
            pp, ss = _convbn(fuse._conv_bn_low)
            p["conv_bn_low"] = pp
            s["conv_bn_low"] = ss
        if hasattr(fuse, "_conv_bn_high"):
            pp, ss = _convbn(fuse._conv_bn_high)
            p["conv_bn_high"] = pp
            s["conv_bn_high"] = ss
        params[f"resized_fuse{i}"] = p
        stats[f"resized_fuse{i}"] = s

    feats = {
        "res2": rng.randn(1, 32, 16, 24).astype(np.float32),
        "res3": rng.randn(1, 64, 8, 12).astype(np.float32),
        "res4": rng.randn(1, 128, 4, 6).astype(np.float32),
        "res5": rng.randn(1, 256, 2, 3).astype(np.float32),
    }
    with torch.no_grad():
        pano_ref, sem_ref, ms_ref = ref.forward_features(
            {k: torch.from_numpy(v) for k, v in feats.items()}
        )

    mine = KMaXPixelDecoder(
        dec_layers=(1, 2, 1, 1), dec_channels=(32, 24, 16, 8),
        layer_types=("axial", "axial", "bottleneck", "bottleneck"),
        spatial_shape=(64, 96),
    )
    pano, sem, ms = mine.apply(
        {"params": params, "batch_stats": stats},
        {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in feats.items()},
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(pano).transpose(0, 3, 1, 2), pano_ref.numpy(),
        rtol=1e-3, atol=1e-3,
    )
    for got, want in zip(ms, ms_ref):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=1e-3, atol=1e-3,
        )

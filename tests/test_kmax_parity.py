"""Numerical parity of kMaX core layers vs the REFERENCE torch modules
(imported read-only with stubbed detectron2/timm — reference_shims.py).

Weights are transplanted from randomly-initialized reference modules into
the flax modules; outputs must match to float tolerance. This validates the
axial-attention RPE/BN wiring and the full k-means transformer layer
(predictor, cluster assignment, self-attention, FFN) against ground truth.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_shims import load_kmax_pixel_decoder, load_kmax_transformer_decoder
from axial_vs_tpu.layers.axial_attention import AxialAttention
from axial_vs_tpu.layers.kmax_layers import KMaXTransformerLayer

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _bn(ref_bn):
    params = {"scale": jnp.asarray(ref_bn.weight.detach().numpy()),
              "bias": jnp.asarray(ref_bn.bias.detach().numpy())}
    stats = {"mean": jnp.asarray(ref_bn.running_mean.numpy()),
             "var": jnp.asarray(ref_bn.running_var.numpy())}
    return params, stats


def _convbn(ref, has_norm=True):
    """reference ConvBN -> (params, stats) for my ConvBN."""
    w = ref.conv.weight.detach().numpy()
    if w.ndim == 3:  # conv1d (O, I, k) -> (k, I, O)
        kernel = w.transpose(2, 1, 0)
    else:  # (O, I, kh, kw) -> (kh, kw, I, O)
        kernel = w.transpose(2, 3, 1, 0)
    conv = {"kernel": jnp.asarray(kernel)}
    if ref.conv.bias is not None:
        conv["bias"] = jnp.asarray(ref.conv.bias.detach().numpy())
    params = {"conv": conv}
    stats = {}
    if has_norm and not isinstance(ref.norm, torch.nn.Identity):
        p, s = _bn(ref.norm)
        params["norm"] = p
        stats["norm"] = s
    return params, stats


def _randomize_bn_stats(module, rng):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                              torch.nn.SyncBatchNorm)):
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(*m.running_mean.shape).astype(np.float32) * 0.2))
                m.running_var.copy_(torch.from_numpy(
                    rng.rand(*m.running_var.shape).astype(np.float32) + 0.5))
                m.weight.copy_(torch.from_numpy(
                    rng.rand(*m.weight.shape).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(
                    rng.randn(*m.bias.shape).astype(np.float32) * 0.1))


def test_axial_attention_matches_reference(rng):
    ref_mod = load_kmax_pixel_decoder()
    torch.manual_seed(0)
    L, C, K, V, H = 9, 24, 16, 32, 4
    ref = ref_mod.AxialAttention(
        in_planes=C, query_shape=L, total_key_depth=K, total_value_depth=V,
        num_heads=H,
    ).eval()
    _randomize_bn_stats(ref, rng)

    qkv_p, _ = _convbn(ref.qkv_transform, has_norm=False)
    bn_qkv_p, bn_qkv_s = _bn(ref._batch_norm_qkv)
    bn_sim_p, bn_sim_s = _bn(ref._batch_norm_similarity)
    bn_out_p, bn_out_s = _bn(ref._batch_norm_retrieved_output)
    params = {
        "qkv_transform": qkv_p,
        "batch_norm_qkv": bn_qkv_p,
        "batch_norm_similarity": bn_sim_p,
        "batch_norm_retrieved_output": bn_out_p,
        "query_rpe": {"embeddings": jnp.asarray(ref._query_rpe._embeddings.weight.detach().numpy())},
        "key_rpe": {"embeddings": jnp.asarray(ref._key_rpe._embeddings.weight.detach().numpy())},
        "value_rpe": {"embeddings": jnp.asarray(ref._value_rpe._embeddings.weight.detach().numpy())},
    }
    stats = {
        "batch_norm_qkv": bn_qkv_s,
        "batch_norm_similarity": bn_sim_s,
        "batch_norm_retrieved_output": bn_out_s,
    }

    x = rng.randn(3, C, L).astype(np.float32)  # torch layout (N, C, L)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()  # (N, V, L)

    mine = AxialAttention(query_shape=L, total_key_depth=K, total_value_depth=V,
                          num_heads=H)
    out = mine.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), out_ref, rtol=2e-4, atol=2e-4
    )


def test_kmax_transformer_layer_matches_reference(rng):
    ref_mod = load_kmax_transformer_decoder()
    torch.manual_seed(1)
    num_classes = 7  # includes void in reference ctor
    # the reference predictor hardcodes 256-ch query heads, so base_filters
    # must be the real 128 (bottleneck 256)
    ref = ref_mod.kMaXTransformerLayer(
        num_classes=num_classes, in_channel_pixel=48, in_channel_query=256,
        base_filters=128, num_heads=8, bottleneck_expansion=2,
        key_expansion=1, value_expansion=2, drop_path_prob=0.0,
    ).eval()
    _randomize_bn_stats(ref, rng)

    params, stats = {}, {}

    def put(name, ref_cb, has_norm=True):
        p, s = _convbn(ref_cb, has_norm)
        params[name] = p
        if s:
            stats[name] = s

    put("query_conv1", ref._query_conv1_bn_act)
    put("pixel_conv1", ref._pixel_conv1_bn_act)
    put("query_qkv_conv", ref._query_qkv_conv_bn)
    put("pixel_v_conv", ref._pixel_v_conv_bn)
    put("query_conv3", ref._query_conv3_bn)
    put("query_ffn_conv1", ref._query_ffn_conv1_bn_act)
    put("query_ffn_conv2", ref._query_ffn_conv2_bn)
    put("kmeans_query_conv3", ref._kmeans_query_conv3_bn)
    p, s = _bn(ref._kmeans_query_batch_norm_retrieved_value)
    params["kmeans_query_batch_norm_retrieved_value"] = p
    stats["kmeans_query_batch_norm_retrieved_value"] = s

    # self-attention BNs
    p1, s1 = _bn(ref._query_self_attention._batch_norm_similarity)
    p2, s2 = _bn(ref._query_self_attention._batch_norm_retrieved_value)
    params["query_self_attention"] = {
        "batch_norm_similarity": p1, "batch_norm_retrieved_value": p2,
    }
    stats["query_self_attention"] = {
        "batch_norm_similarity": s1, "batch_norm_retrieved_value": s2,
    }

    # predictor
    pred_p, pred_s = {}, {}
    for mine_name, ref_cb in (
        ("pixel_space_head_conv0", ref._predcitor._pixel_space_head_conv0bnact),
        ("pixel_space_head_conv1", ref._predcitor._pixel_space_head_conv1bnact),
        ("pixel_space_head_last_conv", ref._predcitor._pixel_space_head_last_convbn),
        ("transformer_mask_head", ref._predcitor._transformer_mask_head),
        ("transformer_class_head", ref._predcitor._transformer_class_head),
    ):
        p, s = _convbn(ref_cb)
        pred_p[mine_name] = p
        if s:
            pred_s[mine_name] = s
    p, s = _bn(ref._predcitor._pixel_space_mask_batch_norm)
    pred_p["pixel_space_mask_batch_norm"] = p
    pred_s["pixel_space_mask_batch_norm"] = s
    params["predictor"] = pred_p
    stats["predictor"] = pred_s

    b, hgt, wdt, n = 2, 6, 5, 12
    pixel = rng.randn(b, 48, hgt, wdt).astype(np.float32)
    query = rng.randn(b, 256, n).astype(np.float32)
    with torch.no_grad():
        q_ref, pred_ref = ref(torch.from_numpy(pixel), torch.from_numpy(query))

    mine = KMaXTransformerLayer(
        num_classes=num_classes, base_filters=128, num_heads=8,
    )
    q_out, pred_out = mine.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pixel.transpose(0, 2, 3, 1)),
        jnp.asarray(query.transpose(0, 2, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(q_out).transpose(0, 2, 1), q_ref.numpy(), rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(pred_out["class_logits"]), pred_ref["class_logits"].numpy(),
        rtol=3e-4, atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pred_out["mask_logits"]).transpose(0, 3, 1, 2),
        pred_ref["mask_logits"].numpy(), rtol=3e-4, atol=3e-4,
    )


def test_semantic_predictor_matches_reference(rng):
    """Aux semantic head (ASPP + PanopticDeepLab decoder) parity."""
    import jax.numpy as jnp
    from axial_vs_tpu.layers.kmax_layers import SemanticPredictor

    ref_mod = load_kmax_transformer_decoder()
    torch.manual_seed(2)
    ref = ref_mod.SemanticPredictor(
        in_channels=64, os8_channels=48, os4_channels=32, num_classes=9,
    ).eval()
    _randomize_bn_stats(ref, rng)

    params, stats = {}, {}

    def put(name, cb):
        p, s = _convbn(cb)
        params[name] = p
        if s:
            stats[name] = s

    aspp_p, aspp_s = {}, {}
    for nm, cb in (
        ("aspp_conv0", ref._aspp._aspp_conv0), ("aspp_conv1", ref._aspp._aspp_conv1),
        ("aspp_conv2", ref._aspp._aspp_conv2), ("aspp_conv3", ref._aspp._aspp_conv3),
        ("aspp_pool", ref._aspp._aspp_pool), ("proj_conv", ref._aspp._proj_conv_bn_act),
    ):
        p, s = _convbn(cb)
        aspp_p[nm] = p
        if s:
            aspp_s[nm] = s
    params["aspp"] = aspp_p
    stats["aspp"] = aspp_s
    put("low_level_projection_os8", ref._low_level_projection_os8)
    put("low_level_fusion_os8_conv0", ref._low_level_fusion_os8_conv0_bn_act)
    put("low_level_fusion_os8_conv1", ref._low_level_fusion_os8_conv1_bn_act)
    put("low_level_projection_os4", ref._low_level_projection_os4)
    put("low_level_fusion_os4_conv0", ref._low_level_fusion_os4_conv0_bn_act)
    put("low_level_fusion_os4_conv1", ref._low_level_fusion_os4_conv1_bn_act)
    put("conv_block_0", ref.conv_block_0)
    put("conv_block_1", ref.conv_block_1)
    put("final_conv", ref.final_conv)

    x = rng.randn(1, 64, 5, 7).astype(np.float32)
    os8 = rng.randn(1, 48, 10, 14).astype(np.float32)
    os4 = rng.randn(1, 32, 20, 28).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(os8),
                      torch.from_numpy(os4)).numpy()

    mine = SemanticPredictor(num_classes=9)
    out = mine.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(os8.transpose(0, 2, 3, 1)),
        jnp.asarray(os4.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref, rtol=1e-3, atol=1e-3
    )

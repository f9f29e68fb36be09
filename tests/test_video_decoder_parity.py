"""Full video (MaXTron) transformer decoder parity vs the reference torch
module: clip folding (b t) c h w -> b c (t h) w, 3-scale k-means layers,
final predictor with mask embeddings + cluster centers outputs."""
import numpy as np
import jax.numpy as jnp
import torch

from reference_shims import load_maxtron_transformer_decoder
from axial_vs_tpu.models.transformer_decoder import KMaXTransformerDecoder
from test_kmax_parity import _bn, _convbn, _randomize_bn_stats

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _transplant_layer(ref):
    """reference kMaXTransformerLayer -> (params, stats) (same mapping as
    test_kmax_parity, incl. the video predictor's extra mask-embedding out)."""
    params, stats = {}, {}

    def put(name, cb):
        p, s = _convbn(cb)
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
    p1, s1 = _bn(ref._query_self_attention._batch_norm_similarity)
    p2, s2 = _bn(ref._query_self_attention._batch_norm_retrieved_value)
    params["query_self_attention"] = {
        "batch_norm_similarity": p1, "batch_norm_retrieved_value": p2,
    }
    stats["query_self_attention"] = {
        "batch_norm_similarity": s1, "batch_norm_retrieved_value": s2,
    }
    pred = ref._predcitor if hasattr(ref, "_predcitor") else ref._predictor
    pp, ps = _transplant_predictor(pred)
    params["predictor"] = pp
    stats["predictor"] = ps
    return params, stats


def _transplant_predictor(pred):
    pp, ps = {}, {}
    for mine_name, cb in (
        ("pixel_space_head_conv0", pred._pixel_space_head_conv0bnact),
        ("pixel_space_head_conv1", pred._pixel_space_head_conv1bnact),
        ("pixel_space_head_last_conv", pred._pixel_space_head_last_convbn),
        ("transformer_mask_head", pred._transformer_mask_head),
        ("transformer_class_head", pred._transformer_class_head),
    ):
        p, s = _convbn(cb)
        pp[mine_name] = p
        if s:
            ps[mine_name] = s
    p, s = _bn(pred._pixel_space_mask_batch_norm)
    pp["pixel_space_mask_batch_norm"] = p
    ps["pixel_space_mask_batch_norm"] = s
    return pp, ps


def test_video_decoder_matches_reference(rng):
    ref_mod = load_maxtron_transformer_decoder()
    torch.manual_seed(0)
    t, n_q, classes = 2, 8, 5
    ref = ref_mod.MaXTronTransformerDecoder(
        dec_layers=[1, 1, 1],
        in_channels=[64, 48, 32],
        num_classes=classes,
        num_queries=n_q,
        drop_path_prob=0.0,
        add_aux_semantic_pred=False,
        use_aux_semantic_decoder=False,
        input_shape_from_backbone=None,
        num_clip_frames=t,
        cross_clip_training=False,
    ).train(True)
    _randomize_bn_stats(ref, rng)
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout) or hasattr(m, "track_running_stats"):
            m.eval()
    # decoder in train mode would require aux semantic; use eval-mode module
    # but with B inferred for video: set cross_clip_training so B=BT//T
    ref.train(False)
    ref._cross_clip_training = True

    params, stats = {}, {}
    for i, layer in enumerate(ref._kmax_transformer_layers):
        p, s = _transplant_layer(layer)
        params[f"layer{i}"] = p
        stats[f"layer{i}"] = s
    params["cluster_centers"] = jnp.asarray(
        ref._cluster_centers.weight.detach().numpy().T
    )
    for mine_name, cb in (
        ("class_embedding_projection", ref._class_embedding_projection),
        ("mask_embedding_projection", ref._mask_embedding_projection),
    ):
        p, s = _convbn(cb)
        params[mine_name] = p
        stats[mine_name] = s
    pp, ps = _transplant_predictor(ref._predictor)
    params["predictor"] = pp
    stats["predictor"] = ps

    b = 1
    ms_t = [
        rng.randn(b * t, 64, 2, 3).astype(np.float32),
        rng.randn(b * t, 48, 4, 6).astype(np.float32),
        rng.randn(b * t, 32, 8, 12).astype(np.float32),
    ]
    pano_t = rng.randn(b * t, 256, 16, 24).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(
            [torch.from_numpy(x) for x in ms_t],
            torch.from_numpy(pano_t),
            None,
        )

    mine = KMaXTransformerDecoder(
        num_classes=classes, dec_layers=(1, 1, 1), num_queries=n_q, num_frames=t,
    )
    out = mine.apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(x.transpose(0, 2, 3, 1)) for x in ms_t],
        jnp.asarray(pano_t.transpose(0, 2, 3, 1)),
        None,
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), out_ref["pred_logits"].numpy(),
        rtol=1e-3, atol=1e-3,
    )
    # reference masks: (B, N, T, H, W); mine (B, T, H, W, N)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]).transpose(0, 4, 1, 2, 3),
        out_ref["pred_masks"].numpy(), rtol=1e-3, atol=1e-3,
    )
    # embeddings: both (B, N, 128) — the 128-d mask kernels
    np.testing.assert_allclose(
        np.asarray(out["pred_mask_embeddings"]),
        out_ref["pred_mask_embeddings"].numpy(), rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["cluster_centers"]),
        out_ref["cluster_centers"].numpy(), rtol=1e-3, atol=1e-3,
    )

"""Cross-clip tracking module parity vs the reference torch implementation
(trajectory attention over clips, temporal ASPP, activation-pooled video
class logits, per-clip mask kernels)."""
import numpy as np
import jax.numpy as jnp
import torch

from reference_shims import load_cc_module
from axial_vs_tpu.models.cc_module import CrossClipTrackingModule
from test_kmax_parity import _bn, _convbn, _randomize_bn_stats

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _lin(tl):
    return {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _ln(tl):
    return {"scale": jnp.asarray(tl.weight.detach().numpy()),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _conv1d(tc):
    return {"kernel": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0)),
            "bias": jnp.asarray(tc.bias.detach().numpy())}


def test_cc_module_matches_reference(rng):
    ref_mod = load_cc_module()
    torch.manual_seed(0)
    num_classes = 6  # without void
    t_clips, q, v = 3, 10, 2
    ref = ref_mod.CrossClipTrackingModule(
        num_layers=2, num_classes=num_classes, attn_drop=0.0, aspp_drop=0.0,
        kernel_sizes=[3, 3, 3], atrous_rates=[1, 2, 3], norm_fn="ln",
        num_clip_frames=v,
    ).eval()
    _randomize_bn_stats(ref, rng)

    params, stats = {}, {}
    for i in range(2):
        ta = ref.transformer_trajectory_self_attention_layers[i]
        params[f"trajectory_attn{i}"] = {
            "qkv": _lin(ta.self_attn.qkv),
            "proj_q": _lin(ta.self_attn.proj_q),
            "proj_kv": _lin(ta.self_attn.proj_kv),
            "proj": _lin(ta.self_attn.proj),
        }
        params[f"attn_norm{i}"] = _ln(ta.norm)
        aspp = ref.conv_short_aggregate_layers[i]
        aspp_p = {
            "aspp_conv0": _conv1d(aspp._aspp_conv0),
            "aspp_conv1": _conv1d(aspp._aspp_conv1),
            "aspp_conv2": _conv1d(aspp._aspp_conv2),
        }
        pp, _ = _convbn(aspp._proj_conv_bn_act, has_norm=False)
        pp["norm"] = _ln(aspp._proj_conv_bn_act.norm)
        aspp_p["proj_conv"] = pp
        params[f"aspp{i}"] = aspp_p
        params[f"conv_norm{i}"] = _ln(ref.conv_norms[i])

    for mine, refcb in (
        ("class_embedding_projection", ref._class_embedding_projection),
        ("mask_embedding_projection", ref._mask_embedding_projection),
    ):
        p, s = _convbn(refcb)
        params[mine] = p
        stats[mine] = s

    pred_p, pred_s = {}, {}
    for mine, refcb in (
        ("transformer_mask_head", ref._predictor._transformer_mask_head),
        ("transformer_class_head", ref._predictor._transformer_class_head),
        ("transformer_class_activation_head",
         ref._predictor._transformer_class_activation_head),
    ):
        p, s = _convbn(refcb)
        pred_p[mine] = p
        if s:
            pred_s[mine] = s
    p, s = _bn(ref._predictor._pixel_space_mask_batch_norm)
    pred_p["pixel_space_mask_batch_norm"] = p
    pred_s["pixel_space_mask_batch_norm"] = s
    params["predictor"] = pred_p
    stats["predictor"] = pred_s

    h, w = 6, 5
    clip_query = rng.randn(1, q, t_clips, 256).astype(np.float32)
    # reference pixel feature layout: B x C x (T*V) x H x W
    pixel = rng.randn(1, 128, t_clips * v, h, w).astype(np.float32)
    with torch.no_grad():
        ref.train(True)  # training branch computes full-batch einsum path
        for m in ref.modules():
            # but keep dropout off and BNs on running stats
            if isinstance(m, torch.nn.Dropout) or hasattr(m, "track_running_stats"):
                m.eval()
        out_ref = ref(torch.from_numpy(clip_query), torch.from_numpy(pixel))

    mine = CrossClipTrackingModule(
        num_classes=num_classes, num_layers=2, num_clip_frames=v,
    )
    # my layout: (B*T_clips, V*H, W, C)
    pix_mine = (
        pixel.reshape(1, 128, t_clips, v, h, w)
        .transpose(0, 2, 3, 4, 5, 1)
        .reshape(t_clips, v * h, w, 128)
    )
    out = mine.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(clip_query), jnp.asarray(pix_mine), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), out_ref["pred_logits"].numpy(),
        rtol=5e-4, atol=5e-4,
    )
    # reference masks: B x N x (T*V) x H x W (train branch); mine (T*V, H, W, N)
    want = out_ref["pred_masks"].numpy()[0].transpose(1, 2, 3, 0)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), want, rtol=5e-4, atol=5e-4
    )

"""End-to-end numerical parity of the Within-Clip Tracking Module vs the
reference torch implementation (pytorch MSDA fallback path) with
transplanted weights: validates the interleaved spatial/temporal encoder,
level/positional embeddings, reference points and in/out projections in one
shot."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from reference_shims import load_wc_msdeformattn
from axial_vs_tpu.models.wc_module import WithinClipTrackingModule

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _lin(tl):
    return {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _ta(tmod):
    return {
        "q": _lin(tmod.q), "k": _lin(tmod.k), "v": _lin(tmod.v),
        "proj_q": _lin(tmod.proj_q), "proj_kv": _lin(tmod.proj_kv),
        "proj": _lin(tmod.proj),
    }


def _ln(tl):
    return {"scale": jnp.asarray(tl.weight.detach().numpy()),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def _axial_layer(tmod):
    return {
        "height_attn": _ta(tmod.height_attn),
        "width_attn": _ta(tmod.width_attn),
        "norm1": _ln(tmod.norm1), "norm2": _ln(tmod.norm2),
        "linear1": _lin(tmod.linear1), "linear2": _lin(tmod.linear2),
    }


def _spatial_layer(tmod):
    sa = tmod.self_attn
    return {
        "self_attn": {
            "value_proj": _lin(sa.value_proj),
            "sampling_offsets": _lin(sa.sampling_offsets),
            "attention_weights": _lin(sa.attention_weights),
            "output_proj": _lin(sa.output_proj),
        },
        "norm1": _ln(tmod.norm1), "norm2": _ln(tmod.norm2),
        "linear1": _lin(tmod.linear1), "linear2": _lin(tmod.linear2),
    }


def _proj_gn(tseq):
    conv, gn = tseq[0], tseq[1]
    return {
        "conv": {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                 "bias": jnp.asarray(conv.bias.detach().numpy())},
        "norm": _ln(gn),
    }


def test_wc_module_matches_reference(rng):
    ref_mod = load_wc_msdeformattn()
    torch.manual_seed(0)

    t, c = 2, 32
    chans = {"res3": 64, "res4": 128, "res5": 256}

    class Shape:
        def __init__(self, channels, stride):
            self.channels = channels
            self.stride = stride

    input_shape = {
        "res3": Shape(64, 8), "res4": Shape(128, 16), "res5": Shape(256, 32)
    }
    ref = ref_mod.MSDeformAttnPixelDecoder(
        input_shape=input_shape,
        transformer_dropout=0.0, transformer_attn_drop=0.0,
        transformer_nheads=4, transformer_dim_feedforward=64,
        transformer_num_stages=2, transformer_spatial_layers=2,
        transformer_temporal_layers=2,
        transformer_temporal_attn_type="axial-trajectory",
        conv_dims=c,
        transformer_spatial_in_features=["res3", "res4", "res5"],
        transformer_temporal_in_features=["res4", "res5"],
        num_clip_frames=t, cross_clip_training=False,
    ).train(False)

    params = {
        "level_embed_2d": jnp.asarray(ref.transformer.level_embed_2d.detach().numpy()),
        "level_embed_3d": jnp.asarray(ref.transformer.level_embed_3d.detach().numpy()),
    }
    for i in range(3):
        params[f"input_proj{i}"] = _proj_gn(ref.input_proj[i])
        params[f"output_proj{i}"] = _proj_gn(ref.output_proj[i])
    for stage in range(2):
        params[f"spatial_layer{stage}"] = _spatial_layer(
            ref.transformer.encoder.spatial_layers[stage]
        )
        tlayer = ref.transformer.encoder.temporal_layers[stage]
        params[f"temporal_encoder{stage}"] = {
            f"layer{j}": _axial_layer(tlayer.temporal_layers[j])
            for j in range(len(tlayer.temporal_layers))
        }

    feats_t = {
        k: rng.randn(t, ch, 8 // (2 ** i), 12 // (2 ** i)).astype(np.float32)
        for i, (k, ch) in enumerate(chans.items())
    }
    with torch.no_grad():
        out_ref, _, _ = ref.forward_features(
            {k: torch.from_numpy(v) for k, v in feats_t.items()}
        )

    mine = WithinClipTrackingModule(
        conv_dims=c, nheads=4, dim_feedforward=64, num_stages=2,
        spatial_layers=2, temporal_layers=2, num_frames=t,
        spatial_in_features=("res3", "res4", "res5"),
        temporal_in_features=("res4", "res5"),
    )
    feats_j = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in feats_t.items()
    }
    out, _, _ = mine.apply({"params": params}, feats_j, train=False)

    for k in chans:
        got = np.asarray(out[k]).transpose(0, 3, 1, 2)
        want = out_ref[k].numpy()
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

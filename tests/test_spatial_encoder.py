"""Legacy kMaX spatial encoder (V27): exact parity vs the reference torch
module (pytorch MSDA fallback) with transplanted weights — covers the
per-layer temporal interleave, gamma-gated temporal skip, original-channel
output projections and the per-level residual gammas of the wrapper."""
import numpy as np
import jax.numpy as jnp
import torch

from reference_shims import load_spatial_encoder
from axial_vs_tpu.models.spatial_encoder import KMaXSpatialEncoder
from test_wc_parity import _lin, _ln, _proj_gn, _spatial_layer, _ta

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _traj_layer(tmod):
    return {
        "temporal_attn": _ta(tmod.temporal_attn),
        "norm1": _ln(tmod.norm1), "norm2": _ln(tmod.norm2),
        "linear1": _lin(tmod.linear1), "linear2": _lin(tmod.linear2),
    }


def test_spatial_encoder_matches_reference(rng):
    wrapper_mod = load_spatial_encoder()
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
    ref = wrapper_mod.kMaXSpatialEncoder(
        input_shape=input_shape,
        transformer_dropout=0.0, transformer_attn_drop=0.0,
        transformer_nheads=4, transformer_dim_feedforward=64,
        transformer_enc_layers=2, transformer_temporal_layers=2,
        transformer_temporal_attn_type="trajectory",
        transformer_conv_dim=c,
        transformer_in_features=["res3", "res4", "res5"],
        transformer_temporal_in_features=["res4", "res5"],
        transformer_skip_connect_spatial=True,
        transformer_skip_connect_temporal=True,
        transformer_zero_init_value=1e-6,
        num_frames=t,
    ).train(False)
    with torch.no_grad():  # make the zero-init gammas non-trivial
        for g in ref.gamma:
            g.add_(torch.randn_like(g) * 0.3)
        ref._spatial_module.transformer.encoder.gamma.add_(
            torch.randn_like(ref._spatial_module.transformer.encoder.gamma) * 0.3)

    inner = ref._spatial_module
    params = {
        "level_embed": jnp.asarray(inner.transformer.level_embed.detach().numpy()),
        "level_embed_3d": jnp.asarray(
            inner.transformer.level_embed_3d.detach().numpy()),
        "gamma_temporal": jnp.asarray(
            inner.transformer.encoder.gamma.detach().numpy()),
    }
    for i in range(3):
        params[f"input_proj{i}"] = _proj_gn(inner.input_proj[i])
        params[f"output_proj{i}"] = _proj_gn(inner.output_proj[i])
        params[f"gamma{i}"] = jnp.asarray(ref.gamma[i].detach().numpy())
    for li in range(2):
        params[f"spatial_layer{li}"] = _spatial_layer(
            inner.transformer.encoder.layers[li])
        tlayer = inner.transformer.encoder.temporal_layers[li]
        params[f"temporal_encoder{li}"] = {
            f"layer{j}": _traj_layer(tlayer.temporal_layers[j])
            for j in range(len(tlayer.temporal_layers))
        }

    feats_t = {
        k: rng.randn(t, ch, 8 // (2 ** i), 12 // (2 ** i)).astype(np.float32)
        for i, (k, ch) in enumerate(chans.items())
    }
    with torch.no_grad():
        # forward_features mutates its input dict; give it a copy
        out_ref = ref.forward_features(
            {k: torch.from_numpy(v).clone() for k, v in feats_t.items()})

    mine = KMaXSpatialEncoder(
        conv_dims=c, nheads=4, dim_feedforward=64, enc_layers=2,
        temporal_layers=2, temporal_attn_type="trajectory",
        in_features=("res3", "res4", "res5"),
        temporal_in_features=("res4", "res5"),
        skip_connect_spatial=True, skip_connect_temporal=True,
        num_frames=t,
    )
    feats_j = {k: jnp.asarray(v.transpose(0, 2, 3, 1))
               for k, v in feats_t.items()}
    out = mine.apply({"params": params}, feats_j, train=False)

    for k in chans:
        got = np.asarray(out[k]).transpose(0, 3, 1, 2)
        want = out_ref[k].numpy()
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4,
                                   err_msg=k)

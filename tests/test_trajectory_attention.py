"""TrajectoryAttention vs the reference torch implementation.

The reference module (`maxtron_deeplab/.../temporal_attention.py`) only
depends on torch+einops, so we import it read-only as the ground-truth
oracle and compare with weights transplanted into the flax module.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import torch

sys.path.insert(
    0, "/root/reference/MaXTron_Video-kMaX/maxtron_deeplab/modeling/within_clip_tracking_module"
)
import temporal_attention as ref_ta  # noqa: E402

from axial_vs_tpu.layers.trajectory_attention import (  # noqa: E402

    TrajectoryAttention,
    TemporalAxialTrajectoryAttentionLayer,
)


import pytest as _pytest

pytestmark = _pytest.mark.parity


def _linear_params(tl):
    return {
        "kernel": jnp.asarray(tl.weight.detach().numpy().T),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }


def test_trajectory_attention_matches_reference():
    torch.manual_seed(0)
    dim, heads, f, n, b = 32, 4, 3, 10, 2
    ref = ref_ta.TrajectoryAttention(dim, num_heads=heads).eval()

    rng = np.random.RandomState(1)
    q = rng.randn(b, f * n, dim).astype(np.float32)
    kq = rng.randn(b, f * n, dim).astype(np.float32)
    v = rng.randn(b, f * n, dim).astype(np.float32)

    with torch.no_grad():
        out_ref, attn_ref = ref(
            torch.from_numpy(kq), torch.from_numpy(kq), torch.from_numpy(v),
            num_frames=f,
        )

    m = TrajectoryAttention(dim=dim, num_heads=heads)
    params = {
        "q": _linear_params(ref.q),
        "k": _linear_params(ref.k),
        "v": _linear_params(ref.v),
        "proj_q": _linear_params(ref.proj_q),
        "proj_kv": _linear_params(ref.proj_kv),
        "proj": _linear_params(ref.proj),
    }
    out, attn = m.apply(
        {"params": params}, jnp.asarray(kq), jnp.asarray(kq), jnp.asarray(v),
        num_frames=f, return_attn=True,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)
    # reference attn shape: ((b h), q, f, n); ours (b, h, q, f, n)
    np.testing.assert_allclose(
        np.asarray(attn).reshape(b * 4, f * n, f, n), attn_ref.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_axial_layer_matches_reference():
    torch.manual_seed(0)
    dim, heads, t, h, w, b = 32, 4, 2, 5, 6, 2
    ref = ref_ta.TemporalAxialTrajectoryAttentionLayer(
        d_model=dim, d_ffn=64, n_heads=heads
    ).eval()

    rng = np.random.RandomState(2)
    src = rng.randn(b * t, h * w, dim).astype(np.float32)
    pos = rng.randn(b, t, h, w, dim).astype(np.float32)

    with torch.no_grad():
        out_ref, h_attn_ref, w_attn_ref = ref(
            torch.from_numpy(src), torch.from_numpy(pos)
        )

    def _ta_params(tmod):
        return {
            "q": _linear_params(tmod.q),
            "k": _linear_params(tmod.k),
            "v": _linear_params(tmod.v),
            "proj_q": _linear_params(tmod.proj_q),
            "proj_kv": _linear_params(tmod.proj_kv),
            "proj": _linear_params(tmod.proj),
        }

    params = {
        "height_attn": _ta_params(ref.height_attn),
        "width_attn": _ta_params(ref.width_attn),
        "norm1": {
            "scale": jnp.asarray(ref.norm1.weight.detach().numpy()),
            "bias": jnp.asarray(ref.norm1.bias.detach().numpy()),
        },
        "norm2": {
            "scale": jnp.asarray(ref.norm2.weight.detach().numpy()),
            "bias": jnp.asarray(ref.norm2.bias.detach().numpy()),
        },
        "linear1": _linear_params(ref.linear1),
        "linear2": _linear_params(ref.linear2),
    }
    m = TemporalAxialTrajectoryAttentionLayer(d_model=dim, d_ffn=64, num_heads=heads)
    out, h_attn, w_attn = m.apply(
        {"params": params}, jnp.asarray(src), jnp.asarray(pos),
        num_frames=t, height=h, width=w, return_attn=True,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h_attn).reshape(h_attn_ref.shape), h_attn_ref.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(w_attn).reshape(w_attn_ref.shape), w_attn_ref.numpy(),
        rtol=1e-4, atol=1e-5,
    )

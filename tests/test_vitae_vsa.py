"""ViTAEv2-VSA backbone: exact parity vs the reference torch implementation
(`mmdet/models/backbones/vitaev2_vsa.py` + vitaev2_vsa_modules/*), plus
grid-sample semantics and shape tests."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from axial_vs_tpu.models.backbones.vitae_vsa import ViTAEv2VSA
from axial_vs_tpu.ops.grid_sample import grid_sample_bilinear
from axial_vs_tpu.utils.torch_convert import convert_vitae_vsa
from reference_shims import load_vitae_vsa

import pytest as _pytest

pytestmark = _pytest.mark.parity


def test_grid_sample_matches_torch(rng):
    img = rng.randn(2, 9, 13, 5).astype(np.float32)
    grid = (rng.rand(2, 6, 7, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    out = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid),
                               align_corners=True)
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


TINY = dict(
    embed_dims=(16, 16, 16, 16),
    token_dims=(16, 32, 64, 128),
    nc_depths=(1, 1, 1, 1),
    nc_heads=(2, 2, 2, 2),
    nc_groups=(1, 2, 2, 2),
)


def _tiny_ref(mod):
    torch.manual_seed(0)
    model = mod.ViTAEv2_VSA(
        embed_dims=16, token_dims=16, NC_depth=[1, 1, 1, 1], NC_heads=2,
        NC_group=[1, 2, 2, 2], drop_path_rate=0.0,
    )
    model.eval()
    # give BN running stats / bias terms non-trivial values so parity
    # actually exercises them
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "bias" in name or "bias_table" in name:
                p.add_(torch.randn_like(p) * 0.02)
        for name, buf in model.named_buffers():
            if "running_mean" in name:
                buf.add_(torch.randn_like(buf) * 0.05)
            if "running_var" in name:
                buf.mul_(1.0 + torch.rand_like(buf) * 0.1)
    return model


def test_vitae_vsa_parity(rng):
    mod = load_vitae_vsa()
    model = _tiny_ref(mod)
    x = rng.randn(1, 3, 224, 256).astype(np.float32)
    with torch.no_grad():
        refs = model(torch.from_numpy(x))

    params, stats = convert_vitae_vsa(
        {k: v.numpy() for k, v in model.state_dict().items()},
        nc_depths=(1, 1, 1, 1),
    )
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    net = ViTAEv2VSA(**TINY)
    out = jax.jit(lambda a: net.apply(
        {"params": params, "batch_stats": stats}, a, train=False))(jx)

    for i, name in enumerate(("res2", "res3", "res4", "res5")):
        got = np.asarray(out[name]).transpose(0, 3, 1, 2)
        ref = refs[i].numpy()
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4,
                                   err_msg=name)


def test_vitae_vsa_shapes(rng):
    net = ViTAEv2VSA(**TINY)
    x = jnp.asarray(rng.randn(1, 224, 256, 3).astype(np.float32))
    vs = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(vs, x, train=False)
    assert out["res2"].shape == (1, 56, 64, 16)
    assert out["res3"].shape == (1, 28, 32, 32)
    assert out["res4"].shape == (1, 14, 16, 64)
    assert out["res5"].shape == (1, 7, 8, 128)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())

"""Core ops vs torch oracles: norms, resize, config system."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from axial_vs_tpu.config import get_default_config
from axial_vs_tpu.ops.norm import BatchNorm, LayerNorm, GroupNorm
from axial_vs_tpu.ops.resize import resize_bilinear, resize_trilinear


# ---------------------------------------------------------------- config ----
def test_config_roundtrip(tmp_path):
    cfg = get_default_config()
    assert cfg.model.kmax.pixel_dec.dec_layers == [1, 5, 1, 1]
    cfg.merge_from_list(["model.num_classes", "124", "solver.base_lr", "0.0002"])
    assert cfg.model.num_classes == 124 and cfg.solver.base_lr == 2e-4
    # YAML with _BASE_
    base = tmp_path / "base.yaml"
    base.write_text("model:\n  num_classes: 40\n")
    leaf = tmp_path / "leaf.yaml"
    leaf.write_text("_BASE_: base.yaml\nsolver:\n  base_lr: 0.5\n")
    cfg.merge_from_file(str(leaf))
    assert cfg.model.num_classes == 40 and cfg.solver.base_lr == 0.5
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.model.num_classes = 1


# ----------------------------------------------------------------- norms ----
def test_batchnorm_matches_torch_eval(rng):
    c = 16
    x = rng.randn(4, 7, 5, c).astype(np.float32)
    bn = BatchNorm(features=c)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # randomize stats/params
    mean = rng.randn(c).astype(np.float32)
    var = rng.rand(c).astype(np.float32) + 0.5
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    y = bn.apply(variables, jnp.asarray(x), train=False)

    tbn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.01)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
        # torch is NCHW
        yt = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_batchnorm_matches_torch_train(rng):
    c = 8
    x = rng.randn(3, 6, 4, c).astype(np.float32)
    bn = BatchNorm(features=c)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y, new_state = bn.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )

    tbn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.01)
    tbn.train()
    with torch.no_grad():
        yt = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )


def test_layernorm_matches_torch(rng):
    c = 32
    x = rng.randn(2, 5, c).astype(np.float32)
    ln = LayerNorm(features=c)
    variables = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = ln.apply(variables, jnp.asarray(x))
    tln = torch.nn.LayerNorm(c, eps=1e-6)
    with torch.no_grad():
        yt = tln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_groupnorm_matches_torch(rng):
    c, g = 32, 8
    x = rng.randn(2, 5, 6, c).astype(np.float32)
    gn = GroupNorm(features=c, num_groups=g)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    variables = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    y = gn.apply(variables, jnp.asarray(x))
    tgn = torch.nn.GroupNorm(g, c)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(scale))
        tgn.bias.copy_(torch.from_numpy(bias))
        yt = tgn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- resize ----
@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (14, 18)), ((14, 18), (7, 9)), ((5, 5), (13, 17)), ((41, 41), (161, 161))],
)
def test_resize_bilinear_matches_torch(rng, align_corners, in_hw, out_hw):
    c = 3
    x = rng.randn(2, *in_hw, c).astype(np.float32)
    y = resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
    with torch.no_grad():
        yt = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw, mode="bilinear", align_corners=align_corners,
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_trilinear_matches_torch(rng, align_corners):
    x = rng.randn(1, 3, 8, 10, 4).astype(np.float32)  # B T H W C
    out = (6, 16, 20)
    y = resize_trilinear(jnp.asarray(x), out, align_corners=align_corners)
    with torch.no_grad():
        yt = TF.interpolate(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3),
            size=out, mode="trilinear", align_corners=align_corners,
        ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_virtual_mesh_available():
    assert jax.device_count() == 8

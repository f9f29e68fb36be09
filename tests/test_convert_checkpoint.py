"""Checkpoint conversion + orbax save/restore tests.

The ResNet oracle is a minimal torchvision-layout ResNet-18-style net built
here in torch (conv1/bn1/layerX.Y.convZ+bnZ/downsample) — converting its
state_dict and comparing features validates layout, stride placement and BN
semantics end-to-end.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from axial_vs_tpu.models.backbones.resnet import ResNet
from axial_vs_tpu.utils.torch_convert import (
    convert_torchvision_resnet, convert_timm_convnext, prepare_cc_weights,
)


_BN_EPS = 1e-3  # the reference backbone uses SyncBN(eps=1e-3) (resnet.py:617)


def _tv_bottleneck(inp, mid, out, stride):
    m = tnn.Module()
    m.conv1 = tnn.Conv2d(inp, mid, 1, bias=False)
    m.bn1 = tnn.BatchNorm2d(mid, eps=_BN_EPS)
    m.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
    m.bn2 = tnn.BatchNorm2d(mid, eps=_BN_EPS)
    m.conv3 = tnn.Conv2d(mid, out, 1, bias=False)
    m.bn3 = tnn.BatchNorm2d(out, eps=_BN_EPS)
    if stride != 1 or inp != out:
        m.downsample = tnn.Sequential(
            tnn.Conv2d(inp, out, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(out, eps=_BN_EPS),
        )
    else:
        m.downsample = None

    def forward(x):
        idt = x if m.downsample is None else m.downsample(x)
        y = tnn.functional.relu(m.bn1(m.conv1(x)))
        y = tnn.functional.relu(m.bn2(m.conv2(y)))
        y = m.bn3(m.conv3(y))
        return tnn.functional.relu(y + idt)

    m.forward = forward
    return m


class TVResNet50(tnn.Module):
    """torchvision-layout ResNet-50 (stride on 3x3 = stride_in_1x1 False)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=_BN_EPS)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        blocks = (3, 4, 6, 3)
        chans = [(64, 64, 256), (256, 128, 512), (512, 256, 1024), (1024, 512, 2048)]
        for li, ((inp, mid, out), nb) in enumerate(zip(chans, blocks)):
            layer = tnn.ModuleList()
            for b in range(nb):
                stride = 2 if (b == 0 and li > 0) else 1
                layer.append(_tv_bottleneck(inp if b == 0 else out, mid, out, stride))
            setattr(self, f"layer{li + 1}", layer)

    def forward(self, x):
        x = tnn.functional.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        feats = []
        for li in range(4):
            for block in getattr(self, f"layer{li + 1}"):
                x = block.forward(x)
            feats.append(x)
        return feats


def test_resnet50_conversion_matches_torch(rng):
    torch.manual_seed(0)
    tm = TVResNet50().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_torchvision_resnet(sd, depth=50)

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        feats_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))

    model = ResNet(depth=50)
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    for stage, ft in zip(("res2", "res3", "res4", "res5"), feats_t):
        got = np.asarray(out[stage])
        want = ft.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_convnext_conversion_roundtrip(rng):
    """Official-repo-layout ConvNeXt state dict converts and runs."""
    from axial_vs_tpu.models.backbones.convnext import ConvNeXt

    depths, dims = (2, 2, 2, 2), (16, 32, 64, 128)
    r = np.random.RandomState(0)
    sd = {}
    sd["downsample_layers.0.0.weight"] = r.randn(dims[0], 3, 4, 4).astype(np.float32)
    sd["downsample_layers.0.0.bias"] = r.randn(dims[0]).astype(np.float32)
    sd["downsample_layers.0.1.weight"] = r.randn(dims[0]).astype(np.float32)
    sd["downsample_layers.0.1.bias"] = r.randn(dims[0]).astype(np.float32)
    for i in range(1, 4):
        sd[f"downsample_layers.{i}.0.weight"] = r.randn(dims[i - 1]).astype(np.float32)
        sd[f"downsample_layers.{i}.0.bias"] = r.randn(dims[i - 1]).astype(np.float32)
        sd[f"downsample_layers.{i}.1.weight"] = r.randn(dims[i], dims[i - 1], 2, 2).astype(np.float32)
        sd[f"downsample_layers.{i}.1.bias"] = r.randn(dims[i]).astype(np.float32)
    for si, d in enumerate(depths):
        for bi in range(d):
            t = f"stages.{si}.{bi}"
            c = dims[si]
            sd[f"{t}.dwconv.weight"] = r.randn(c, 1, 7, 7).astype(np.float32)
            sd[f"{t}.dwconv.bias"] = r.randn(c).astype(np.float32)
            sd[f"{t}.norm.weight"] = r.randn(c).astype(np.float32)
            sd[f"{t}.norm.bias"] = r.randn(c).astype(np.float32)
            sd[f"{t}.pwconv1.weight"] = r.randn(4 * c, c).astype(np.float32)
            sd[f"{t}.pwconv1.bias"] = r.randn(4 * c).astype(np.float32)
            sd[f"{t}.pwconv2.weight"] = r.randn(c, 4 * c).astype(np.float32)
            sd[f"{t}.pwconv2.bias"] = r.randn(c).astype(np.float32)
            sd[f"{t}.gamma"] = r.randn(c).astype(np.float32)
    for i in range(4):
        sd[f"norm{i}.weight"] = r.randn(dims[i]).astype(np.float32)
        sd[f"norm{i}.bias"] = r.randn(dims[i]).astype(np.float32)

    params = convert_timm_convnext(sd, depths=depths)
    model = ConvNeXt(depths=depths, dims=dims)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    ref_vs = model.init(jax.random.PRNGKey(0), x)
    # converted tree must cover exactly the same structure
    flat_ref = jax.tree_util.tree_structure(ref_vs["params"])
    flat_got = jax.tree_util.tree_structure(params)
    assert flat_ref == flat_got, (flat_ref, flat_got)
    out = model.apply({"params": params}, x)
    assert out["res5"].shape == (1, 1, 1, 128)
    assert np.isfinite(np.asarray(out["res5"])).all()


def test_prepare_cc_weights():
    variables = {
        "params": {
            "transformer_decoder": {
                "class_embedding_projection": {"conv": {"kernel": np.ones((1, 4, 4))}},
                "mask_embedding_projection": {"conv": {"kernel": np.ones((1, 4, 4)) * 2}},
                "predictor": {
                    "transformer_mask_head": {"conv": {"kernel": np.ones((1, 4, 2))}},
                    "transformer_class_head": {"conv": {"kernel": np.ones((1, 4, 3))}},
                    "pixel_space_mask_batch_norm": {"scale": np.ones((1,))},
                },
            }
        }
    }
    out = prepare_cc_weights(variables)
    cc = out["params"]["cc_module"]
    np.testing.assert_array_equal(
        cc["class_embedding_projection"]["conv"]["kernel"], np.ones((1, 4, 4))
    )
    np.testing.assert_array_equal(
        cc["predictor"]["transformer_class_head"]["conv"]["kernel"], np.ones((1, 4, 3))
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    from axial_vs_tpu.engine.checkpoint import CheckpointManager

    state = {
        "step": jnp.asarray(3),
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(3, state, force=True)
    mgr.wait()
    assert mgr.latest_step() == 3
    template = jax.tree.map(np.zeros_like, state)
    restored = mgr.restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )


def test_convnext_scan_matches_unrolled(rng):
    """nn.scan'd stages (compile-size optimization) are numerically identical
    to the unrolled blocks; the converter stacking helper maps params."""
    from axial_vs_tpu.models.backbones.convnext import ConvNeXt
    from axial_vs_tpu.utils.torch_convert import stack_convnext_for_scan

    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    m1 = ConvNeXt(depths=(2, 2, 2, 2), dims=(8, 16, 24, 32), use_scan=False)
    m2 = ConvNeXt(depths=(2, 2, 2, 2), dims=(8, 16, 24, 32), use_scan=True)
    vs1 = m1.init(jax.random.PRNGKey(0), x)
    p2 = stack_convnext_for_scan(vs1["params"], depths=(2, 2, 2, 2))
    o1 = m1.apply(vs1, x)
    o2 = m2.apply({"params": p2}, x)
    for k in ("res2", "res5"):
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), atol=1e-5
        )


def test_swin_conversion_roundtrip(rng):
    """Official-layout Swin state dict converts to a tree that matches the
    module structure and runs. NOTE: the official patch-merging concat order
    is [x0, x1, x2, x3] = [(0,0),(1,0),(0,1),(1,1)] — ours matches."""
    from axial_vs_tpu.models.backbones.swin import SwinTransformer
    from axial_vs_tpu.utils.torch_convert import convert_swin

    depths, dim, heads = (1, 1, 1, 1), 16, (2, 2, 4, 4)
    r = np.random.RandomState(0)
    sd = {}
    sd["patch_embed.proj.weight"] = r.randn(dim, 3, 4, 4).astype(np.float32)
    sd["patch_embed.proj.bias"] = r.randn(dim).astype(np.float32)
    sd["patch_embed.norm.weight"] = r.randn(dim).astype(np.float32)
    sd["patch_embed.norm.bias"] = r.randn(dim).astype(np.float32)
    d = dim
    ws = 4
    for si, dep in enumerate(depths):
        for bi in range(dep):
            t = f"layers.{si}.blocks.{bi}"
            sd[f"{t}.norm1.weight"] = r.randn(d).astype(np.float32)
            sd[f"{t}.norm1.bias"] = r.randn(d).astype(np.float32)
            sd[f"{t}.norm2.weight"] = r.randn(d).astype(np.float32)
            sd[f"{t}.norm2.bias"] = r.randn(d).astype(np.float32)
            sd[f"{t}.attn.qkv.weight"] = r.randn(3 * d, d).astype(np.float32)
            sd[f"{t}.attn.qkv.bias"] = r.randn(3 * d).astype(np.float32)
            sd[f"{t}.attn.proj.weight"] = r.randn(d, d).astype(np.float32)
            sd[f"{t}.attn.proj.bias"] = r.randn(d).astype(np.float32)
            sd[f"{t}.attn.relative_position_bias_table"] = r.randn(
                (2 * ws - 1) ** 2, heads[si]
            ).astype(np.float32)
            sd[f"{t}.mlp.fc1.weight"] = r.randn(4 * d, d).astype(np.float32)
            sd[f"{t}.mlp.fc1.bias"] = r.randn(4 * d).astype(np.float32)
            sd[f"{t}.mlp.fc2.weight"] = r.randn(d, 4 * d).astype(np.float32)
            sd[f"{t}.mlp.fc2.bias"] = r.randn(d).astype(np.float32)
        if si < 3:
            sd[f"layers.{si}.downsample.norm.weight"] = r.randn(4 * d).astype(np.float32)
            sd[f"layers.{si}.downsample.norm.bias"] = r.randn(4 * d).astype(np.float32)
            sd[f"layers.{si}.downsample.reduction.weight"] = r.randn(
                2 * d, 4 * d
            ).astype(np.float32)
            d *= 2
    for i in range(4):
        c = dim * (2 ** i)
        sd[f"norm{i}.weight"] = r.randn(c).astype(np.float32)
        sd[f"norm{i}.bias"] = r.randn(c).astype(np.float32)

    params = convert_swin(sd, depths=depths)
    model = SwinTransformer(embed_dim=dim, depths=depths, num_heads=heads,
                            window_size=ws)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    ref_vs = model.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(ref_vs["params"]) == \
        jax.tree_util.tree_structure(params)
    out = model.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out["res5"])).all()


@pytest.mark.parametrize("block_type", ["cat", "add"])
def test_stdc_parity_vs_reference(rng, block_type):
    """STDCNet matches the reference torch backbone exactly (eval mode)
    after weight transplant, for both bottleneck types."""
    torch = pytest.importorskip("torch")
    from reference_shims import load_tube_link_stdc
    from axial_vs_tpu.models.backbones.stdc import STDCNet
    from axial_vs_tpu.utils.torch_convert import convert_stdc

    ref_mod = load_tube_link_stdc()
    ref = ref_mod.STDCNet813(
        base=16, layers=[2, 2, 2], block_num=4, type=block_type,
        pretrain_model=None, norm_layer=torch.nn.BatchNorm2d,
    )
    ref.eval()
    # make BN stats non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    params, stats = convert_stdc(ref.state_dict(), layers=(2, 2, 2))
    model = STDCNet(base=16, layers=(2, 2, 2), block_num=4,
                    block_type=block_type)

    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        f4, f8, f16, f32 = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    for name, t in (("res2", f4), ("res3", f8), ("res4", f16), ("res5", f32)):
        np.testing.assert_allclose(
            np.asarray(out[name]), t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4, err_msg=name,
        )


def test_swin_parity_vs_reference(rng):
    """SwinTransformer matches the reference torch backbone (kmax d2 Swin,
    `kmax_deeplab/modeling/backbone/swin.py:498-680`) after weight
    transplant: windowed attention w/ relative bias, shifted masks, patch
    merging, per-stage output norms."""
    torch = pytest.importorskip("torch")
    from reference_shims import load_kmax_swin
    from axial_vs_tpu.models.backbones.swin import SwinTransformer
    from axial_vs_tpu.utils.torch_convert import convert_swin

    ref_mod = load_kmax_swin()
    depths, dim, heads, ws = (2, 2, 2, 2), 16, (2, 2, 4, 4), 4
    ref = ref_mod.SwinTransformer(
        pretrain_img_size=32, embed_dim=dim, depths=list(depths),
        num_heads=list(heads), window_size=ws, drop_path_rate=0.0,
        ape=False, patch_norm=True, out_indices=(0, 1, 2, 3),
    )
    ref.eval()

    params = convert_swin(ref.state_dict(), depths=depths)
    model = SwinTransformer(embed_dim=dim, depths=depths, num_heads=heads,
                            window_size=ws, drop_path_rate=0.0)

    # two sizes: window-aligned (no pad) and unaligned (pad path)
    for hw in (32, 48):
        x = rng.randn(1, hw, hw, 3).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply({"params": params}, jnp.asarray(x))
        for k in ("res2", "res3", "res4", "res5"):
            np.testing.assert_allclose(
                np.asarray(out[k]),
                ref_out[k].numpy().transpose(0, 2, 3, 1),
                rtol=2e-4, atol=2e-4, err_msg=f"{k}@{hw}",
            )

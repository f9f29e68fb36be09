"""RAFT optical flow: parity vs the reference's vendored RAFT_core (torch),
plus correlation-pyramid / convex-upsampling unit checks."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from axial_vs_tpu.models.raft import (
    RAFT, corr_pyramid, corr_lookup, upsample_flow_convex,
)
from axial_vs_tpu.utils.torch_convert import convert_raft
from reference_shims import load_raft

import pytest as _pytest

pytestmark = _pytest.mark.parity


def test_corr_pyramid_and_lookup_match_torch(rng):
    mod = load_raft()
    f1 = rng.randn(2, 16, 16, 24).astype(np.float32)  # (B, C, H, W) torch
    f2 = rng.randn(2, 16, 16, 24).astype(np.float32)
    blk = mod.CorrBlock(torch.from_numpy(f1), torch.from_numpy(f2), radius=3)
    coords = (rng.rand(2, 2, 16, 24).astype(np.float32)
              * np.array([24, 16], np.float32)[None, :, None, None])
    ref = blk(torch.from_numpy(coords)).numpy()  # (B, L*n*n, H, W)

    pyr = corr_pyramid(jnp.asarray(f1.transpose(0, 2, 3, 1)),
                       jnp.asarray(f2.transpose(0, 2, 3, 1)), num_levels=4)
    got = corr_lookup(pyr, jnp.asarray(coords.transpose(0, 2, 3, 1)), radius=3)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-4)


def test_upsample_flow_matches_torch(rng):
    mod = load_raft()
    model = mod.RAFT()
    flow = rng.randn(2, 2, 6, 9).astype(np.float32)
    mask = rng.randn(2, 576, 6, 9).astype(np.float32)
    ref = model.upsample_flow(torch.from_numpy(flow),
                              torch.from_numpy(mask)).numpy()
    got = upsample_flow_convex(jnp.asarray(flow.transpose(0, 2, 3, 1)),
                               jnp.asarray(mask.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-4)


def test_raft_full_parity(rng):
    mod = load_raft()
    torch.manual_seed(0)
    model = mod.RAFT()
    model.eval()
    with torch.no_grad():  # non-trivial BN stats for the cnet
        for name, buf in model.named_buffers():
            if "running_mean" in name:
                buf.add_(torch.randn_like(buf) * 0.02)
            if "running_var" in name:
                buf.mul_(1.0 + torch.rand_like(buf) * 0.1)

    # >=128px a side so the coarsest corr level stays >=2px (the torch
    # oracle's bilinear_sampler divides by size-1)
    img1 = (rng.rand(1, 3, 128, 192) * 255).astype(np.float32)
    img2 = (rng.rand(1, 3, 128, 192) * 255).astype(np.float32)
    with torch.no_grad():
        _, ref = model(torch.from_numpy(img1), torch.from_numpy(img2),
                       iters=4, test_mode=True)
    ref = ref.numpy()

    params, stats = convert_raft(
        {k: v.numpy() for k, v in model.state_dict().items()})
    net = RAFT(iters=4)
    got = jax.jit(lambda a, b: net.apply(
        {"params": params, "batch_stats": stats}, a, b, train=False))(
        jnp.asarray(img1.transpose(0, 2, 3, 1)),
        jnp.asarray(img2.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)


def test_warp_nearest_ref_matches_torch_flowwarp(rng):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_tc", "/root/reference/MaXTron_Tube-Link/scripts/test_vspw/TC_cal.py")
    # TC_cal imports heavy deps at module scope; replicate only flowwarp here
    # by executing the function source via the loaded reference RAFT shim is
    # overkill — instead compare against torch.grid_sample directly with the
    # reference's exact normalization (TC_cal.py:13-38).
    from axial_vs_tpu.evaluation.vspw_metrics import warp_nearest_ref

    h, w = 17, 23
    labels = rng.randint(0, 50, size=(h, w)).astype(np.int32)
    flow = (rng.randn(h, w, 2) * 3).astype(np.float32)

    x = torch.from_numpy(labels[None, None].astype(np.float32))
    flo = torch.from_numpy(flow.transpose(2, 0, 1)[None])
    xx = torch.arange(0, w).view(1, -1).repeat(h, 1)
    yy = torch.arange(0, h).view(-1, 1).repeat(1, w)
    grid = torch.cat([xx.view(1, 1, h, w), yy.view(1, 1, h, w)], 1).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    ref = torch.nn.functional.grid_sample(
        x, vgrid.permute(0, 2, 3, 1), mode="nearest", align_corners=False
    ).int().squeeze().numpy()

    got = warp_nearest_ref(labels, flow)
    np.testing.assert_array_equal(got, ref)


def test_vspw_tc_cli_end_to_end(rng, tmp_path):
    """Full surface: frames+preds on disk, torch RAFT checkpoint, CLI run."""
    import subprocess, sys
    from PIL import Image

    mod = load_raft()
    torch.manual_seed(1)
    model = mod.RAFT()
    sd = {"module." + k: v for k, v in model.state_dict().items()}
    torch.save(sd, tmp_path / "raft.pth")

    gt = tmp_path / "vspw"
    (gt / "data" / "vid0" / "origin").mkdir(parents=True)
    pred = tmp_path / "run" / "pred" / "vid0"
    pred.mkdir(parents=True)
    (gt / "val.txt").write_text("vid0\n")
    for i in range(3):
        Image.fromarray(
            (rng.rand(120, 184, 3) * 255).astype(np.uint8)
        ).save(gt / "data" / "vid0" / "origin" / f"{i:05d}.jpg")
        Image.fromarray(
            rng.randint(0, 10, size=(120, 184)).astype(np.uint8)
        ).save(pred / f"{i:05d}.png")

    out = subprocess.run(
        [sys.executable, "tools/eval_vspw_tc.py", "--gtdir", str(gt),
         "--preddir", str(tmp_path / "run"), "--raft-weights",
         str(tmp_path / "raft.pth"), "--num-classes", "10", "--iters", "2"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TC score is" in out.stdout
    score = float(out.stdout.rsplit("TC score is", 1)[1].strip())
    assert 0.0 <= score <= 1.0

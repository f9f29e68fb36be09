"""Aux subsystems: profiler timers, OOM retry, VSPW metrics, visualizer."""
import numpy as np
import jax.numpy as jnp

from axial_vs_tpu.engine.profiler import PhaseTimer
from axial_vs_tpu.utils.memory import retry_if_oom
from axial_vs_tpu.evaluation.vspw_metrics import (
    SemanticIoU, video_consistency, temporal_consistency, warp_by_flow,
)


def test_phase_timer():
    t = PhaseTimer(sync=False)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_retry_if_oom_passthrough():
    @retry_if_oom
    def f(x):
        return x + 1

    assert int(f(jnp.asarray(1))) == 2

    calls = []

    @retry_if_oom
    def g(x):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return x * 2

    assert int(g(jnp.asarray(3))) == 6
    assert len(calls) == 2


def test_semantic_iou_perfect():
    m = SemanticIoU(num_classes=4)
    gt = np.random.RandomState(0).randint(0, 4, (16, 16))
    m.update(gt, gt)
    assert m.miou() == 1.0


def test_video_consistency():
    gt = np.zeros((8, 8, 8), np.int64)
    pred = gt.copy()
    assert np.nanmean(video_consistency(gt, pred, window=4)) == 1.0
    pred2 = gt.copy()
    pred2[3] = 1  # one inconsistent frame
    vc = np.nanmean(video_consistency(gt, pred2, window=4))
    assert vc < 1.0


def test_video_consistency_matches_reference(rng):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_vc",
        "/root/reference/MaXTron_Tube-Link/scripts/test_vspw/VC_perclip.py")
    ref_vc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_vc)
    gts = rng.randint(0, 3, (10, 6, 7)).astype(np.int64)
    preds = rng.randint(0, 3, (10, 6, 7)).astype(np.int64)
    want = ref_vc.get_common(list(gts), list(preds), 4, 6, 7)
    got = video_consistency(gts, preds, window=4)
    np.testing.assert_allclose(got, want)


def test_semantic_iou_matches_reference_evaluator(rng):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_vspw_utils",
        "/root/reference/MaXTron_Tube-Link/scripts/test_vspw/utils.py")
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    gt = rng.randint(0, 5, (3, 20, 20))
    pred = rng.randint(0, 5, (3, 20, 20))
    pred[gt == 4] = 4  # make one class near-perfect
    ref = ref_utils.Evaluator(8)  # classes 5..7 never occur
    ref.add_batch(gt, pred)
    mine = SemanticIoU(num_classes=8)
    mine.update(gt, pred)
    np.testing.assert_allclose(mine.miou(),
                               ref.Mean_Intersection_over_Union())


def test_temporal_consistency_with_shift_flow():
    pred = np.zeros((2, 10, 10), np.int64)
    pred[0, :, 2:5] = 1
    pred[1, :, 3:6] = 1  # object moved right by 1
    flow = np.zeros((1, 10, 10, 2), np.float32)
    flow[..., 0] = -1.0  # backward flow: frame1 pixel came from x-1
    tc = temporal_consistency(pred, flow, num_classes=2)
    assert tc > 0.9  # warped frame0 matches frame1
    tc0 = temporal_consistency(pred, np.zeros_like(flow), num_classes=2)
    assert tc0 < tc


def test_visualizer():
    from demo.visualizer import draw_panoptic, draw_attention

    frame = np.zeros((16, 16, 3), np.uint8)
    ids = np.full((16, 16), -1)
    ids[2:8, 2:8] = 5
    out = draw_panoptic(frame, ids)
    assert out.shape == frame.shape and out[4, 4].sum() > 0
    attn = np.random.RandomState(0).rand(4, 4)
    heat = draw_attention(frame, attn)
    assert heat.shape == frame.shape


def test_vspw_vc_iou_clis(rng, tmp_path):
    """Drive the VC and mIoU CLIs end-to-end on a synthetic VSPW tree."""
    import subprocess
    import sys as _sys
    from PIL import Image

    gt = tmp_path / "vspw"
    pred = tmp_path / "run" / "pred" / "vid0"
    (gt / "data" / "vid0" / "mask").mkdir(parents=True)
    pred.mkdir(parents=True)
    (gt / "val.txt").write_text("vid0\n")
    for i in range(6):
        m = rng.randint(0, 5, size=(20, 30)).astype(np.uint8)
        Image.fromarray(m).save(gt / "data" / "vid0" / "mask" / f"{i:05d}.png")
        Image.fromarray(m).save(pred / f"{i:05d}.png")  # perfect predictions

    env = {**__import__("os").environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [_sys.executable, "tools/eval_vspw_vc.py", "--gtdir", str(gt),
         "--preddir", str(tmp_path / "run"), "--clip-num", "4"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-1500:]
    assert "VC4 score: 1.000000" in out.stdout

    out = subprocess.run(
        [_sys.executable, "tools/eval_vspw_iou.py", "--gtdir", str(gt),
         "--preddir", str(tmp_path / "run"), "--num-classes", "5"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-1500:]
    assert "mIoU: 1.000000" in out.stdout

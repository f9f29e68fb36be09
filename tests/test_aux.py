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
    assert video_consistency(gt, pred, window=4) == 1.0
    pred2 = gt.copy()
    pred2[3] = 1  # one inconsistent frame
    vc = video_consistency(gt, pred2, window=4)
    assert vc < 1.0


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

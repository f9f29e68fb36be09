"""TaoTracker / IDOLTracker: id-sequence parity vs the reference torch
trackers over multi-frame synthetic scenes, plus qdtrack similarity / L2
loss semantics."""
import numpy as np
import torch

from axial_vs_tpu.trackers.idol import IDOLTracker
from axial_vs_tpu.trackers.tao import TaoTracker
from axial_vs_tpu.trackers.similarity import (
    cal_similarity, l2_similarity_loss)
from reference_shims import load_qdtrack_trackers

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _frames(rng, num_frames=5, n=6, embed_dim=16, size=24):
    out = []
    for _ in range(num_frames):
        x1 = rng.rand(n, 1) * 10
        y1 = rng.rand(n, 1) * 10
        w = rng.rand(n, 1) * 8 + 2
        h = rng.rand(n, 1) * 8 + 2
        score = rng.rand(n, 1)
        bboxes = np.concatenate([x1, y1, x1 + w, y1 + h, score], 1).astype(np.float32)
        labels = rng.randint(0, 3, size=n).astype(np.int64)
        embeds = rng.randn(n, embed_dim).astype(np.float32)
        masks = (rng.randn(n, size, size) * 3).astype(np.float32)
        out.append((bboxes, labels, embeds, masks))
    return out


def test_tao_tracker_matches_reference(rng):
    tao_mod, _ = load_qdtrack_trackers()
    ref = tao_mod.TaoTracker(init_score_thr=0.1, obj_score_thr=0.1,
                             match_score_thr=0.3)
    mine = TaoTracker(init_score_thr=0.1, obj_score_thr=0.1,
                      match_score_thr=0.3)
    for fid, (bboxes, labels, embeds, _) in enumerate(_frames(rng)):
        rb, rl, rids = ref.match(torch.from_numpy(bboxes.copy()),
                                 torch.from_numpy(labels.copy()),
                                 torch.from_numpy(embeds.copy()), fid)
        mb, ml, mids = mine.match(bboxes, labels, embeds, fid)
        np.testing.assert_array_equal(mids, rids.numpy(), err_msg=f"frame {fid}")
        np.testing.assert_allclose(mb, rb.numpy(), atol=1e-5)
        np.testing.assert_array_equal(ml, rl.numpy())


def test_idol_tracker_matches_reference(rng):
    _, idol_mod = load_qdtrack_trackers()
    kwargs = dict(init_score_thr=0.1, addnew_score_thr=0.3, obj_score_thr=0.1,
                  match_score_thr=0.3, memo_momentum=0.5)
    ref = idol_mod.IDOL_Tracker(**kwargs)
    mine = IDOLTracker(**kwargs)
    for fid, (bboxes, labels, embeds, masks) in enumerate(_frames(rng)):
        rb, rl, rids = ref.match(torch.from_numpy(bboxes.copy()),
                                 torch.from_numpy(labels.copy()),
                                 torch.from_numpy(masks.copy()[:, None]),
                                 torch.from_numpy(embeds.copy()), fid)
        mb, ml, mids = mine.match(bboxes, labels, masks, embeds, fid)
        np.testing.assert_array_equal(mids, rids.numpy(), err_msg=f"frame {fid}")
        np.testing.assert_allclose(mb, rb.numpy(), atol=1e-5)


def test_idol_long_match_frame_weight_matches_reference(rng):
    _, idol_mod = load_qdtrack_trackers()
    kwargs = dict(init_score_thr=0.1, addnew_score_thr=0.3, obj_score_thr=0.1,
                  match_score_thr=0.3, memo_momentum=0.5, long_match=True,
                  frame_weight=True, temporal_weight=True, memory_len=3)
    ref = idol_mod.IDOL_Tracker(**kwargs)
    mine = IDOLTracker(**kwargs)
    for fid, (bboxes, labels, embeds, masks) in enumerate(_frames(rng, 8)):
        _, _, rids = ref.match(torch.from_numpy(bboxes.copy()),
                               torch.from_numpy(labels.copy()),
                               torch.from_numpy(masks.copy()[:, None]),
                               torch.from_numpy(embeds.copy()), fid)
        _, _, mids = mine.match(bboxes, labels, masks, embeds, fid)
        np.testing.assert_array_equal(mids, rids.numpy(), err_msg=f"frame {fid}")


def test_cal_similarity_matches_reference(rng):
    tao_mod, _ = load_qdtrack_trackers()
    import tracker.qdtrack.track.similarity as ref_sim
    a = rng.randn(5, 8).astype(np.float32)
    b = rng.randn(7, 8).astype(np.float32)
    for method, temp in (("dot_product", -1), ("dot_product", 0.07),
                         ("cosine", -1)):
        got = cal_similarity(a, b, method, temp)
        want = ref_sim.cal_similarity(torch.from_numpy(a), torch.from_numpy(b),
                                      method=method, temperature=temp).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_l2_similarity_loss_semantics(rng):
    pred = rng.rand(4, 6).astype(np.float32)
    target = (rng.rand(4, 6) > 0.7).astype(np.float32)
    loss, avg = l2_similarity_loss(pred, target)
    want = np.mean((np.clip(pred, 0, 1) - target) ** 2)
    np.testing.assert_allclose(loss, want, rtol=1e-6)
    # margins shift positives/negatives before clamping
    loss_m, _ = l2_similarity_loss(pred, target, pos_margin=0.2)
    shifted = pred.copy()
    shifted[target == 1] -= 0.2
    want_m = np.mean((np.clip(shifted, 0, 1) - target) ** 2)
    np.testing.assert_allclose(loss_m, want_m, rtol=1e-6)
    # neg:pos cap reduces the averaged element count
    _, avg_capped = l2_similarity_loss(pred, target, neg_pos_ub=1,
                                       hard_mining=True)
    assert avg_capped < avg

"""unitrack association tracker: full multi-frame behavioral parity vs the
reference torch AssociationTracker (lap/cython_bbox stubbed with equivalent
solvers on BOTH sides), plus component parity for the matching costs."""
from types import SimpleNamespace

import numpy as np
import torch

from axial_vs_tpu.trackers.unitrack import (
    AssociationTracker, STrack, bbox_ious_plus1, fuse_motion, iou_distance,
    linear_assignment, reconsdot_distance,
)
from axial_vs_tpu.trackers.kalman import KalmanFilter
from reference_shims import load_unitrack

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _scene(rng, num_frames=6, n=5):
    """Moving boxes with consistent features + per-frame jitter/dropout."""
    base = np.stack([
        rng.rand(n) * 40, rng.rand(n) * 40,
        rng.rand(n) * 15 + 45, rng.rand(n) * 15 + 45], axis=1)
    base[:, 2:] += base[:, :2]
    vel = rng.randn(n, 2) * 2
    feats = rng.randn(n, 16) * 2
    frames = []
    for f in range(num_frames):
        keep = rng.rand(n) > 0.15
        boxes = base.copy()
        boxes[:, [0, 2]] += vel[:, :1] * f
        boxes[:, [1, 3]] += vel[:, 1:] * f
        boxes = boxes[keep] + rng.randn(keep.sum(), 4) * 0.5
        scores = 0.55 + 0.4 * rng.rand(keep.sum())
        fr_feats = feats[keep] + rng.randn(keep.sum(), 16) * 0.05
        frames.append((boxes.astype(np.float64), scores, fr_feats))
    return frames


def _ref_tracker(bt, mt):
    opt = SimpleNamespace(
        conf_thres=0.5, track_buffer=4, use_kalman=True, motion_lambda=0.98,
        motion_gated=True, confirm_iou_thres=0.7, dup_iou_thres=0.15,
        asso_with_motion=True, device="cpu", feat_size=(4, 4),
        img_size=(64, 64))

    class InjectTracker(mt.AssociationTracker):
        def prepare_obs(self, img, img0, obs, embs=None):
            dets = []
            for row, feat in zip(obs, img):  # feats smuggled through `img`
                tlwh = np.r_[row[:2], row[2:4] - row[:2]]
                dets.append(bt.STrack(tlwh, row[4], torch.tensor(feat)[:, None],
                                      self.buffer_size, use_kalman=True))
            return dets

    return InjectTracker(opt)


def test_unitrack_multiframe_parity(rng):
    bt, matching, mt, _ = load_unitrack()
    bt.BaseTrack._count = 0
    STrack._count = 0
    ref = _ref_tracker(bt, mt)
    mine = AssociationTracker(conf_thres=0.5, track_buffer=4)

    for boxes, scores, feats in _scene(rng):
        obs = np.concatenate([boxes, scores[:, None]], axis=1)
        ref_out = ref.update(feats, None, obs)
        my_out = mine.update(boxes, scores, feats)
        ref_ids = sorted(int(t.track_id) for t in ref_out)
        my_ids = sorted(int(t.track_id) for t in my_out)
        assert my_ids == ref_ids
        ref_boxes = {int(t.track_id): t.tlbr for t in ref_out}
        for t in my_out:
            np.testing.assert_allclose(
                t.tlbr, ref_boxes[int(t.track_id)], atol=1e-6)


def test_matching_components_parity(rng):
    bt, matching, mt, ref_kalman = load_unitrack()
    n, m = 4, 6
    a = rng.rand(n, 4) * 30
    a[:, 2:] += a[:, :2] + 5
    b = rng.rand(m, 4) * 30
    b[:, 2:] += b[:, :2] + 5
    np.testing.assert_allclose(
        iou_distance(list(a), list(b)),
        matching.iou_distance(list(a), list(b)), atol=1e-9)

    cost = rng.rand(n, m)
    my_m, my_ua, my_ub = linear_assignment(cost.copy(), 0.6)
    ref_m, ref_ua, ref_ub = matching.linear_assignment(cost.copy(), 0.6)
    assert sorted(map(tuple, my_m.tolist())) == sorted(
        map(tuple, ref_m.tolist()))
    assert sorted(my_ua.tolist()) == sorted(np.asarray(ref_ua).tolist())
    assert sorted(my_ub.tolist()) == sorted(np.asarray(ref_ub).tolist())

    # reconsdot over (C, n) patch features
    bt.BaseTrack._count = 0
    STrack._count = 0
    tracks_ref, tracks_my, dets_ref, dets_my = [], [], [], []
    for i in range(3):
        f = rng.randn(8, 5)
        tl = np.r_[a[i][:2], a[i][2:] - a[i][:2]]
        tracks_ref.append(bt.STrack(tl, 0.9, torch.tensor(f), 30))
        tracks_my.append(STrack(tl, 0.9, f))
    for j in range(4):
        f = rng.randn(8, 5)
        tl = np.r_[b[j][:2], b[j][2:] - b[j][:2]]
        dets_ref.append(bt.STrack(tl, 0.8, torch.tensor(f), 30))
        dets_my.append(STrack(tl, 0.8, f))
    want, _ = matching.reconsdot_distance(tracks_ref, dets_ref)
    got = reconsdot_distance(tracks_my, dets_my)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # fuse_motion against the reference kalman filter
    kf_my = KalmanFilter()
    kf_ref = ref_kalman.KalmanFilter()
    for t_my, t_ref in zip(tracks_my, tracks_ref):
        t_my.activate(kf_my, 1)
        t_ref.activate(kf_ref, 1)
    cost = rng.rand(3, 4)
    got = fuse_motion(kf_my, cost.copy(), tracks_my, dets_my)
    want = matching.fuse_motion(kf_ref, cost.copy(), tracks_ref, dets_ref)
    np.testing.assert_allclose(got, want, atol=1e-6)

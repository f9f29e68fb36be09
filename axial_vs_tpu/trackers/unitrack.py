"""unitrack association tracker (host-side numpy).

Re-implements `MaXTron_Tube-Link/tracker/unitrack/{basetrack.py,
multitracker.py, core/association/matching.py, box.py, mask.py}`: a
ByteTrack-style track state machine (New/Tracked/Lost/Removed) with
constant-velocity Kalman motion, EMA appearance features, and the
three-stage association cascade (appearance reconsdot -> motion-fused LAP
-> IoU for leftovers -> IoU for unconfirmed tracks).

TPU-native divergence: the reference's torchvision `AppearanceModel` zoo
(`unitrack/model/`) is replaced by caller-supplied embeddings — this
framework extracts appearance features from its own backbones (any
`models/backbones/*` feature map pooled per box/mask), so no separate
appearance network is vendored. Pass per-detection feature vectors or
(C, n) patch features to `AssociationTracker.update`.
"""
from __future__ import annotations

import numpy as np

from ..evaluation.vipseg_evaluator import lap_with_cost_limit
from .kalman import CHI2INV95, KalmanFilter
from .similarity import l2_normalize, softmax


class TrackState:
    New = 0
    Tracked = 1
    Lost = 2
    Removed = 3


def tlwh_to_xyah(tlwh):
    ret = np.asarray(tlwh, np.float64).copy()
    ret[:2] += ret[2:] / 2
    ret[2] /= ret[3]
    return ret


class STrack:
    """`basetrack.py:58-205` minus the pose branch."""

    _count = 0

    def __init__(self, tlwh, score, feat, category=-1, mask=None,
                 use_kalman=True, alpha=0.9):
        self._tlwh = np.asarray(tlwh, np.float64)
        self.kalman_filter = None
        self.mean = None
        self.covariance = None
        self.use_kalman = use_kalman
        self.is_activated = not use_kalman
        self.score = score
        self.category = category
        self.mask = mask
        self.tracklet_len = 0
        self.alpha = alpha
        self.smooth_feat = None
        self.curr_feat = None
        self.update_features(np.asarray(feat, np.float64))
        self.state = TrackState.New
        self.track_id = 0
        self.frame_id = 0
        self.start_frame = 0

    @staticmethod
    def next_id():
        STrack._count += 1
        return STrack._count

    @property
    def end_frame(self):
        return self.frame_id

    def update_features(self, feat):
        self.curr_feat = feat
        if self.smooth_feat is None or self.smooth_feat.shape != feat.shape:
            self.smooth_feat = feat
        else:
            self.smooth_feat = (self.alpha * self.smooth_feat
                                + (1 - self.alpha) * feat)

    @staticmethod
    def multi_predict(tracks, kf):
        for t in tracks:
            mean = t.mean.copy()
            if t.state != TrackState.Tracked:
                mean[7] = 0.0
            t.mean, t.covariance = kf.predict(mean, t.covariance)

    def activate(self, kf, frame_id):
        self.kalman_filter = kf
        self.track_id = self.next_id()
        if self.use_kalman:
            self.mean, self.covariance = kf.initiate(tlwh_to_xyah(self._tlwh))
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        if frame_id == 1:
            self.is_activated = True
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        self._apply_measurement(new_track)
        self.update_features(new_track.curr_feat)
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()

    def update(self, new_track, frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self._apply_measurement(new_track)
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.category = new_track.category
        self.update_features(new_track.curr_feat)

    def _apply_measurement(self, new_track):
        if self.use_kalman:
            self.mean, self.covariance = self.kalman_filter.update(
                self.mean, self.covariance, tlwh_to_xyah(new_track.tlwh))
        else:
            self._tlwh = np.asarray(new_track.tlwh, np.float64)
        if new_track.mask is not None:
            self.mask = new_track.mask

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()
        ret[2] *= ret[3]
        ret[:2] -= ret[2:] / 2
        return ret

    @property
    def tlbr(self):
        ret = self.tlwh.copy()
        ret[2:] += ret[:2]
        return ret

    def to_xyah(self):
        return tlwh_to_xyah(self.tlwh)

    def mark_lost(self):
        self.state = TrackState.Lost

    def mark_removed(self):
        self.state = TrackState.Removed


# ---- matching (`core/association/matching.py`) -----------------------------

def linear_assignment(cost, thresh):
    """lap.lapjv(extend_cost, cost_limit) semantics via scipy."""
    cost = np.asarray(cost, np.float64)
    if cost.size == 0:
        return (np.empty((0, 2), int), tuple(range(cost.shape[0])),
                tuple(range(cost.shape[1])))
    x = lap_with_cost_limit(cost, thresh)
    matches = np.asarray([[i, int(j)] for i, j in enumerate(x) if j >= 0],
                         int).reshape(-1, 2)
    return matches, np.where(x < 0)[0], np.asarray(
        sorted(set(range(cost.shape[1])) - set(matches[:, 1].tolist())), int)


def bbox_ious_plus1(a, b):
    """cython_bbox convention (+1 on widths/heights), as unitrack's
    `matching.ious` uses (`matching.py:8,43-60`)."""
    iw = (np.minimum(a[:, None, 2], b[None, :, 2])
          - np.maximum(a[:, None, 0], b[None, :, 0]) + 1)
    ih = (np.minimum(a[:, None, 3], b[None, :, 3])
          - np.maximum(a[:, None, 1], b[None, :, 1]) + 1)
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    inter[(iw <= 0) | (ih <= 0)] = 0.0
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def iou_distance(atracks, btracks):
    atlbrs = [t.tlbr if isinstance(t, STrack) else t for t in atracks]
    btlbrs = [t.tlbr if isinstance(t, STrack) else t for t in btracks]
    if not atlbrs or not btlbrs:
        return np.zeros((len(atlbrs), len(btlbrs)), np.float64)
    return 1 - bbox_ious_plus1(np.asarray(atlbrs, np.float64),
                               np.asarray(btlbrs, np.float64))


def embedding_distance(tracks, detections):
    """cosine cdist on smoothed track features vs current det features."""
    if not tracks or not detections:
        return np.zeros((len(tracks), len(detections)), np.float64)
    det = np.stack([d.curr_feat.reshape(-1) for d in detections])
    trk = np.stack([t.smooth_feat.reshape(-1) for t in tracks])
    cos = l2_normalize(trk) @ l2_normalize(det).T
    return np.maximum(0.0, 1.0 - cos)

def fuse_motion(kf, cost, tracks, detections, only_position=False,
                lambda_=0.98, gate=True):
    if cost.size == 0:
        return cost
    gating_dim = 2 if only_position else 4
    threshold = CHI2INV95[gating_dim]
    measurements = np.asarray([d.to_xyah() for d in detections])
    for row, track in enumerate(tracks):
        gdist = kf.gating_distance(track.mean, track.covariance, measurements)
        if gate:
            cost[row, gdist > threshold] = np.inf
        cost[row] = lambda_ * cost[row] + (1 - lambda_) * gdist
    return cost


def category_gate(cost, tracks, detections):
    tcat = np.asarray([t.category for t in tracks])
    dcat = np.asarray([d.category for d in detections])
    cost = cost.copy()
    cost[tcat[:, None] != dcat[None, :]] = np.inf
    return cost


def reconsdot_distance(tracks, detections, tmp=100.0):
    """(`matching.py:194-238`) cross-reconstruction dot-product cost: each
    track patch-feature set is softly reconstructed from detection patches
    (and vice versa); cost = 1 - mean cosine between the reconstruction and
    the original. Features may be (C,) vectors or (C, n) patch sets."""
    if not tracks or not detections:
        return np.zeros((len(tracks), len(detections)), np.float64)

    def stack(feats):
        feats = [f.reshape(f.shape[0], -1) for f in feats]
        n = max(f.shape[1] for f in feats)
        out = np.zeros((len(feats), feats[0].shape[0], n), np.float64)
        for i, f in enumerate(feats):
            out[i, :, : f.shape[1]] = f
        return out

    fdet = stack([d.curr_feat for d in detections])
    ftrk = stack([t.curr_feat for t in tracks])
    fdet = l2_normalize(fdet, axis=1)
    ftrk = l2_normalize(ftrk, axis=1)
    ndet, ndim, nsd = fdet.shape
    ntrk, _, nst = ftrk.shape

    fd = fdet.transpose(0, 2, 1).reshape(-1, ndim)
    ft = ftrk.transpose(0, 2, 1).reshape(-1, ndim)
    aff = ft @ fd.T
    aff_td = softmax(tmp * aff, axis=1)
    aff_dt = softmax(tmp * aff, axis=0).T

    recons_t = np.einsum(
        "tds,dsm->tdm", aff_td.reshape(ntrk * nst, ndet, nsd),
        fd.reshape(ndet, nsd, ndim))
    recons_d = np.einsum(
        "dts,tsm->dtm", aff_dt.reshape(ndet * nsd, ntrk, nst),
        ft.reshape(ntrk, nst, ndim))
    recons_t = recons_t.transpose(0, 2, 1).reshape(ntrk, nst * ndim, ndet)
    recons_d = recons_d.transpose(0, 2, 1).reshape(ndet, nsd * ndim, ntrk)
    dot_td = np.einsum(
        "tad,ta->td", l2_normalize(recons_t, axis=1),
        l2_normalize(ft.reshape(ntrk, nst * ndim)))
    dot_dt = np.einsum(
        "dat,da->dt", l2_normalize(recons_d, axis=1),
        l2_normalize(fd.reshape(ndet, nsd * ndim)))
    return 1 - 0.5 * (dot_td + dot_dt.T)


def joint_stracks(a, b):
    seen = {t.track_id for t in a}
    return list(a) + [t for t in b if t.track_id not in seen]


def sub_stracks(a, b):
    drop = {t.track_id for t in b}
    return [t for t in a if t.track_id not in drop]


def remove_duplicate_stracks(a, b, ioudist=0.15):
    pdist = iou_distance(a, b)
    dupa, dupb = set(), set()
    for p, q in zip(*np.where(pdist < ioudist)):
        if a[p].frame_id - a[p].start_frame > b[q].frame_id - b[q].start_frame:
            dupb.add(q)
        else:
            dupa.add(p)
    return ([t for i, t in enumerate(a) if i not in dupa],
            [t for i, t in enumerate(b) if i not in dupb])


class AssociationTracker:
    """`multitracker.py:25-162` update cascade (box and mask variants are the
    same machine; masks ride along on STrack.mask)."""

    def __init__(self, conf_thres=0.5, track_buffer=30, use_kalman=True,
                 motion_lambda=0.98, motion_gated=True, confirm_iou_thres=0.7,
                 dup_iou_thres=0.15, asso_thresh=0.7, iou_thresh=0.5,
                 category_gated=False):
        self.det_thresh = conf_thres
        self.max_time_lost = track_buffer
        self.use_kalman = use_kalman
        self.motion_lambda = motion_lambda if use_kalman else 1.0
        self.motion_gated = motion_gated and use_kalman
        self.confirm_iou_thres = confirm_iou_thres
        self.dup_iou_thres = dup_iou_thres
        self.asso_thresh = asso_thresh
        self.iou_thresh = iou_thresh
        self.category_gated = category_gated
        self.kalman_filter = KalmanFilter()
        self.reset_all()

    def reset_all(self):
        self.tracked_stracks = []
        self.lost_stracks = []
        self.removed_stracks = []
        self.frame_id = 0

    def update(self, tlbrs, scores, feats, categories=None, masks=None):
        """tlbrs (N, 4) xyxy; scores (N,); feats: per-det feature arrays.
        Returns the activated tracks after this frame."""
        self.frame_id += 1
        detections = []
        for i in range(len(tlbrs)):
            tlbr = np.asarray(tlbrs[i], np.float64)
            tlwh = np.r_[tlbr[:2], tlbr[2:] - tlbr[:2]]
            detections.append(STrack(
                tlwh, float(scores[i]), np.asarray(feats[i]),
                category=-1 if categories is None else int(categories[i]),
                mask=None if masks is None else masks[i],
                use_kalman=self.use_kalman))

        activated, refind, lost, removed = [], [], [], []
        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]

        # 1: appearance association over tracked+lost
        tracks = joint_stracks(tracked, self.lost_stracks)
        dists = reconsdot_distance(tracks, detections)
        if self.use_kalman:
            STrack.multi_predict(tracks, self.kalman_filter)
            dists = fuse_motion(self.kalman_filter, dists, tracks, detections,
                                lambda_=self.motion_lambda,
                                gate=self.motion_gated)
        if self.category_gated:
            dists = category_gate(dists, tracks, detections)
        matches, u_track, u_det = linear_assignment(dists, self.asso_thresh)
        for it, idet in matches:
            t = tracks[it]
            if t.state == TrackState.Tracked:
                t.update(detections[idet], self.frame_id)
                activated.append(t)
            else:
                t.re_activate(detections[idet], self.frame_id)
                refind.append(t)

        # 2: IoU association for leftovers (kalman mode only, ref :94-123)
        if self.use_kalman:
            tracks = [tracks[i] for i in u_track
                      if tracks[i].state == TrackState.Tracked]
            detections = [detections[i] for i in u_det]
            matches, u_track, u_det = linear_assignment(
                iou_distance(tracks, detections), self.iou_thresh)
            for it, idet in matches:
                t = tracks[it]
                if t.state == TrackState.Tracked:
                    t.update(detections[idet], self.frame_id)
                    activated.append(t)
                else:
                    t.re_activate(detections[idet], self.frame_id)
                    refind.append(t)

            # 3: unconfirmed tracks vs remaining detections
            detections = [detections[i] for i in u_det]
            matches, u_unconfirmed, u_det = linear_assignment(
                iou_distance(unconfirmed, detections), self.confirm_iou_thres)
            for it, idet in matches:
                unconfirmed[it].update(detections[idet], self.frame_id)
                activated.append(unconfirmed[it])
            for it in u_unconfirmed:
                unconfirmed[it].mark_removed()
                removed.append(unconfirmed[it])

        for it in u_track:
            if tracks[it].state != TrackState.Lost:
                tracks[it].mark_lost()
                lost.append(tracks[it])

        for inew in u_det:
            d = detections[inew]
            if d.score >= self.det_thresh:
                d.activate(self.kalman_filter, self.frame_id)
                activated.append(d)

        for t in self.lost_stracks:
            if self.frame_id - t.end_frame > self.max_time_lost:
                t.mark_removed()
                removed.append(t)

        self.tracked_stracks = [
            t for t in self.tracked_stracks if t.state == TrackState.Tracked]
        self.tracked_stracks = joint_stracks(self.tracked_stracks, activated)
        self.tracked_stracks = joint_stracks(self.tracked_stracks, refind)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks.extend(lost)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.removed_stracks)
        self.removed_stracks.extend(removed)
        self.tracked_stracks, self.lost_stracks = remove_duplicate_stracks(
            self.tracked_stracks, self.lost_stracks, self.dup_iou_thres)
        return [t for t in self.tracked_stracks if t.is_activated]

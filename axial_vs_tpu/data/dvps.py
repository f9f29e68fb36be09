"""DVPS-format video datasets: VIPSeg-DVPS, KITTI-STEP, Cityscapes-DVPS,
VSPW (semantic-only).

Re-designs the Tube-Link dataset family (`MaXTron_Tube-Link/datasets/
datasets/{vipseg_dvps,kitti_step_dvps,cityscapes_dvps,vspw_vss}.py`, T10):
sequences of frames with per-frame DVPS panoptic PNGs (channel 0 = semantic
class, channels 1+2 = instance id low/high bytes) or plain semantic PNGs
(VSPW). Provides per-sequence indexing (`SeqObj`-style), clip sampling for
training (``ref_sample_mode='sequence'``) and streaming pairs for testing
(``'test'``), plus padded tube-target construction shared with the VIPSeg
mapper.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from .catalog import DatasetCatalog, MetadataCatalog


def decode_dvps_png(png: np.ndarray):
    """(H, W, 3) -> (semantic (H, W), instance (H, W))."""
    sem = png[..., 0].astype(np.int64)
    inst = png[..., 1].astype(np.int64) + 256 * png[..., 2].astype(np.int64)
    return sem, inst


def load_depth_png(path: str) -> np.ndarray:
    """16-bit depth PNG -> float32 metres: /256, clamped at 80 m, 0 =
    missing (ref `datasets/pipelines/loading.py:172-176`)."""
    depth = np.asarray(Image.open(path), np.float32) / 256.0
    return np.minimum(depth, 80.0)


def load_dvps_sequences(image_root: str, label_root: str,
                        image_suffix: str = ".jpg", label_suffix: str = ".png",
                        semantic_only: bool = False,
                        depth_root: str | None = None,
                        depth_suffix: str = ".png"):
    """Directory layout: <root>/<sequence>/<frame>{suffix}. Returns video
    dicts compatible with the clip mappers. ``depth_root`` mirrors
    ``label_root`` with 16-bit depth PNGs (Cityscapes-DVPS / SemKITTI-DVPS,
    ref `cityscapes_dvps.py:158` resolves depth paths next to images)."""
    videos = []
    for seq_dir in sorted(glob.glob(os.path.join(image_root, "*"))):
        if not os.path.isdir(seq_dir):
            continue
        seq = os.path.basename(seq_dir)
        frames = []
        for img_path in sorted(glob.glob(os.path.join(seq_dir, f"*{image_suffix}"))):
            stem = os.path.splitext(os.path.basename(img_path))[0]
            label_path = os.path.join(label_root, seq, stem + label_suffix)
            depth_path = None
            if depth_root is not None:
                cand = os.path.join(depth_root, seq, stem + depth_suffix)
                depth_path = cand if os.path.exists(cand) else None
            frames.append(
                dict(
                    file_name=img_path,
                    dvps_label_file=label_path if os.path.exists(label_path) else None,
                    depth_file=depth_path,
                    semantic_only=semantic_only,
                )
            )
        if frames:
            videos.append(dict(video_id=seq, frames=frames))
    return videos


def register_dvps(name, image_root, label_root, num_classes, thing_classes,
                  semantic_only=False, label_divisor=10000, ignore_label=255,
                  depth_root=None):
    DatasetCatalog.register(
        name,
        lambda: load_dvps_sequences(image_root, label_root,
                                    semantic_only=semantic_only,
                                    depth_root=depth_root),
    )
    meta = MetadataCatalog.get(name)
    meta.image_root = image_root
    meta.label_root = label_root
    meta.depth_root = depth_root
    meta.with_depth = depth_root is not None
    meta.num_classes = num_classes
    meta.thing_classes = list(thing_classes)
    meta.label_divisor = label_divisor
    meta.ignore_label = ignore_label
    meta.semantic_only = semantic_only
    return meta


class DVPSClipMapper:
    """DVPS video dict -> padded tube training sample."""

    def __init__(self, *, image_size, num_frames=2, max_instances=100,
                 thing_classes=(), ignore_label=255,
                 pixel_mean=(123.675, 116.28, 103.53),
                 pixel_std=(58.395, 57.12, 57.375), seed=0,
                 ref_sample_mode="window", ref_seq_index=(-2, -1, 1, 2)):
        self.image_size = tuple(image_size)
        self.num_frames = num_frames
        self.max_instances = max_instances
        self.things = set(thing_classes)
        self.ignore = ignore_label
        self.pixel_mean = np.asarray(pixel_mean, np.float32)
        self.pixel_std = np.asarray(pixel_std, np.float32)
        self.rng = np.random.RandomState(seed)
        # 'window' = contiguous clip (the reference's 'sequence' mode with
        # consecutive ref_seq_index, `vipseg_dvps.py:410-430`); 'random' =
        # key frame + refs at random offsets from ref_seq_index
        # (`vipseg_dvps.py:393-409` — the jittered-pair sampling the 2-frame
        # VPS trainer uses; out-of-range offsets fall back to the key).
        if ref_sample_mode not in ("window", "random"):
            raise ValueError(f"unknown ref_sample_mode {ref_sample_mode!r}")
        self.ref_sample_mode = ref_sample_mode
        self.ref_seq_index = tuple(ref_seq_index)

    def _sample_indices(self, n_frames: int):
        t = self.num_frames
        if self.ref_sample_mode == "random":
            key = int(self.rng.randint(n_frames))
            idxs = [key]
            for _ in range(t - 1):
                cands = [key + o for o in self.ref_seq_index
                         if 0 <= key + o < n_frames]
                idxs.append(int(cands[self.rng.randint(len(cands))])
                            if cands else key)
            return idxs
        if n_frames <= t:
            return list(range(n_frames)) + [n_frames - 1] * (t - n_frames)
        s = self.rng.randint(0, n_frames - t + 1)
        return list(range(s, s + t))

    def __call__(self, video, dataset=None):
        frames = video["frames"]
        t = self.num_frames
        idxs = self._sample_indices(len(frames))

        th, tw = self.image_size
        h4, w4 = (th + 3) // 4, (tw + 3) // 4
        m = self.max_instances
        images = np.zeros((t, th, tw, 3), np.float32)
        sems = np.full((t, h4, w4), -1, np.int64)
        insts = np.zeros((t, h4, w4), np.int64)
        with_depth = any(frames[i].get("depth_file") for i in idxs)
        depths = np.zeros((t, th, tw), np.float32) if with_depth else None

        for fi, idx in enumerate(idxs):
            fr = frames[idx]
            img = np.asarray(Image.open(fr["file_name"]).convert("RGB"))
            h, w = img.shape[:2]
            x = (img.astype(np.float32) - self.pixel_mean) / self.pixel_std
            images[fi, : min(h, th), : min(w, tw)] = x[:th, :tw]
            if with_depth and fr.get("depth_file"):
                d = load_depth_png(fr["depth_file"])
                depths[fi, : min(d.shape[0], th), : min(d.shape[1], tw)] = (
                    d[:th, :tw])
            if fr["dvps_label_file"] is None:
                continue
            lbl = np.asarray(Image.open(fr["dvps_label_file"]))
            if lbl.ndim == 2 or fr.get("semantic_only"):
                sem = (lbl if lbl.ndim == 2 else lbl[..., 0]).astype(np.int64)
                inst = np.zeros_like(sem)
            else:
                sem, inst = decode_dvps_png(lbl)
            sem = np.where(sem == self.ignore, -1, sem)
            sem4 = sem[::4, ::4][:h4, :w4]
            inst4 = inst[::4, ::4][:h4, :w4]
            sems[fi, : sem4.shape[0], : sem4.shape[1]] = sem4
            insts[fi, : inst4.shape[0], : inst4.shape[1]] = inst4

        # tube instances keyed by (class, instance-id); stuff keyed by class
        labels = np.zeros((m,), np.int32)
        masks = np.zeros((m, t, h4, w4), np.float32)
        valid = np.zeros((m,), bool)
        slot_by_key = {}
        slot = 0
        for fi in range(t):
            sem, inst = sems[fi], insts[fi]
            for cls in np.unique(sem):
                if cls < 0:
                    continue
                if cls in self.things:
                    for iid in np.unique(inst[sem == cls]):
                        key = (int(cls), int(iid))
                        if key not in slot_by_key:
                            if slot >= m:
                                continue
                            slot_by_key[key] = slot
                            labels[slot] = cls
                            valid[slot] = True
                            slot += 1
                        masks[slot_by_key[key], fi] = np.logical_or(
                            masks[slot_by_key[key], fi],
                            (sem == cls) & (inst == iid),
                        )
                else:
                    key = (int(cls), -1)
                    if key not in slot_by_key:
                        if slot >= m:
                            continue
                        slot_by_key[key] = slot
                        labels[slot] = cls
                        valid[slot] = True
                        slot += 1
                    masks[slot_by_key[key], fi] = np.logical_or(
                        masks[slot_by_key[key], fi], sem == cls
                    )
        targets = dict(
            labels=labels, masks=masks, valid=valid,
            semantic_masks=sems.astype(np.int32),
        )
        if depths is not None:
            # full-res metres; 0 = no measurement (DSTQ's DQ ignores
            # zero-depth pixels, `evaluation/dstq.py`)
            targets["depths"] = depths
        return dict(images=images, targets=targets)

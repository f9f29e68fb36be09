"""Panoptic visualization (demo/ + demo_video/ equivalents, V26).

Color-codes panoptic id maps over video frames and renders attention maps
(the demo_attn/ use case) with cv2.
"""
from __future__ import annotations

import numpy as np


def _color_for_id(seg_id: int) -> np.ndarray:
    rng = np.random.RandomState(seg_id * 2654435761 % (2 ** 31))
    return rng.randint(60, 255, 3).astype(np.uint8)


def draw_panoptic(frame: np.ndarray, panoptic_ids: np.ndarray,
                  alpha: float = 0.55) -> np.ndarray:
    """frame (H, W, 3) uint8; panoptic_ids (H, W) int (<0 = void)."""
    overlay = frame.copy()
    for sid in np.unique(panoptic_ids):
        if sid < 0:
            continue
        mask = panoptic_ids == sid
        overlay[mask] = _color_for_id(int(sid))
    out = (alpha * overlay + (1 - alpha) * frame).astype(np.uint8)
    try:
        import cv2

        edges = np.zeros_like(panoptic_ids, np.uint8)
        for sid in np.unique(panoptic_ids):
            if sid < 0:
                continue
            m = (panoptic_ids == sid).astype(np.uint8)
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            cv2.drawContours(out, contours, -1, (255, 255, 255), 1)
    except ImportError:
        pass
    return out


def draw_attention(frame: np.ndarray, attn: np.ndarray,
                   alpha: float = 0.6) -> np.ndarray:
    """Overlays a (h, w) attention map (any scale) resized to the frame."""
    from axial_vs_tpu.ops.resize import resize_bilinear_np

    a = attn.astype(np.float32)
    a = (a - a.min()) / max(a.max() - a.min(), 1e-8)
    a = resize_bilinear_np(a[..., None], frame.shape[:2])[:, :, 0]
    heat = np.stack([255 * a, 64 * a, 255 * (1 - a)], axis=-1).astype(np.uint8)
    return (alpha * heat + (1 - alpha) * frame).astype(np.uint8)


def save_video(frames, path: str, fps: int = 10):
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()

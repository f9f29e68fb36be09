"""Parity: VPS panoptic fusion modes vs the reference torch fusion head
(`mmdet/models/seg_heads/panoptic_fusion_heads/maskformer_fusion_head.py`)
loaded read-only via reference_shims."""
import numpy as np
import pytest
import torch

from axial_vs_tpu.models.tube_link.fusion import (
    panoptic_fusion, panoptic_sort, panoptic_with_query,
)
from reference_shims import load_maskformer_fusion_head


@pytest.fixture(scope="module")
def ref_head():
    mod = load_maskformer_fusion_head()

    def make(mode, **test_cfg):
        return mod.MaskFormerFusionHead(
            num_things_classes=3, num_stuff_classes=2,
            test_cfg=dict(test_cfg), panoptic_mode=mode,
        )

    return make


def _inputs(rng, q=12, k=5, h=24, w=32):
    cls_logits = rng.randn(q, k + 1).astype(np.float32) * 3
    # structured masks so segments are non-trivial: blobby logits
    base = rng.randn(q, h, w).astype(np.float32)
    for i in range(q):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        yy, xx = np.mgrid[0:h, 0:w]
        base[i] += 8 * np.exp(-(((yy - cy) / 6.0) ** 2 + ((cx - xx) / 6.0) ** 2))
        base[i] -= 4
    return cls_logits, base


@pytest.mark.parametrize("mode,cfg", [
    ("with_query", dict(object_mask_thr=0.5, iou_thr=0.6)),
    ("with_query", dict(object_mask_thr=0.8, iou_thr=0.8,
                        filter_low_score=True)),
    ("sort", dict(object_mask_thr=0.5, overlap_thr=0.6)),
    ("sort_with_query", dict(object_mask_thr=0.3, overlap_thr=0.6)),
])
def test_fusion_matches_reference(rng, ref_head, mode, cfg):
    head = ref_head(mode, **cfg)
    for trial in range(5):
        cls_logits, mask_logits = _inputs(rng)
        tc, tm = torch.tensor(cls_logits), torch.tensor(mask_logits)
        if mode == "with_query":
            want, want_q = head.panoptic_postprocess_with_query(tc, tm)
        elif mode == "sort":
            want = head.panoptic_postprocess_sort_score(tc, tm)
            want_q = []
        else:
            want, want_q = head.panoptic_postprocess_sort_score_query(tc, tm)
        got, got_q = panoptic_fusion(
            "sort" if mode == "sort" else mode,
            cls_logits, mask_logits, num_things=3, num_classes=5, **cfg)
        np.testing.assert_array_equal(got, want.numpy())
        assert got_q == [(int(a), int(b)) for a, b in want_q]


def test_fusion_empty_keep(ref_head):
    """All queries void-classified: pan map must be all-void, no queries."""
    q, k, h, w = 6, 5, 8, 10
    cls_logits = np.zeros((q, k + 1), np.float32)
    cls_logits[:, k] = 10.0  # void wins everywhere
    mask_logits = np.zeros((q, h, w), np.float32)
    got, got_q = panoptic_with_query(
        cls_logits, mask_logits, num_things=3, num_classes=5), None
    pan, ql = got
    assert (pan == 5).all() and ql == []


def test_sperate_focal_sanity(rng):
    """``sperate_focal`` (intended semantics — the reference's own method is
    bit-rotted, see fusion.panoptic_sperate_focal docstring): thing topk
    over the flattened (thing-query x thing-class) table, stuff from the
    fixed-slot diagonal, score-sorted merge."""
    from axial_vs_tpu.models.tube_link.fusion import panoptic_sperate_focal

    nt, ns, q_th, h, w = 3, 2, 6, 16, 20
    q = q_th + ns
    cls_logits = np.full((q, nt + ns + 1), -4.0, np.float32)
    mask_logits = np.full((q, h, w), -8.0, np.float32)
    # thing query 1 strongly predicts class 0 on the left half
    cls_logits[1, 0] = 8.0
    mask_logits[1, :, : w // 2] = 8.0
    # stuff slot 0 (class nt+0) owns the right half
    cls_logits[q_th + 0, nt + 0] = 8.0
    mask_logits[q_th + 0, :, w // 2:] = 8.0
    # stuff slot 1 stays silent -> low score, masked out by argmax
    pan = panoptic_sperate_focal(
        cls_logits, mask_logits, num_things=nt, num_classes=nt + ns,
        num_thing_queries=q_th, max_per_image=10, object_mask_thr=0.5)
    from axial_vs_tpu.models.tube_link.fusion import INSTANCE_OFFSET

    left = pan[:, : w // 2]
    right = pan[:, w // 2:]
    assert (right == nt + 0).all()          # stuff class id, no instance
    assert (left % INSTANCE_OFFSET == 0).all() and (left // INSTANCE_OFFSET > 0).all()
    # dispatch path returns (pan, []) like the other non-query modes
    from axial_vs_tpu.models.tube_link.fusion import panoptic_fusion

    pan2, ql = panoptic_fusion(
        "sperate_focal", cls_logits, mask_logits, nt, nt + ns,
        num_thing_queries=q_th, max_per_image=10, object_mask_thr=0.5)
    np.testing.assert_array_equal(pan, pan2)
    assert ql == []

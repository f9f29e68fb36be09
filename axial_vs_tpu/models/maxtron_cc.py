"""MaXTron CC meta-architecture: frozen segmenter + cross-clip module.

Re-designs `maxtron_deeplab/maxtron_cc_model.py:29-540`: the backbone + kMaX
head run frozen clip-by-clip (`segmentor_windows_inference` :371-403,
no-grad), per-clip cluster centers are Hungarian-aligned across clips on
normalized mask-embedding cosine cost (:280-300, 360-369), and only the
CrossClipTrackingModule trains / infers on top. Evaluation pads the video to
a clip multiple and emits whole-video panoptic maps (:262-266).

Everything runs inside one jit: windows are a static python loop (count =
num_video_frames / num_clip_frames), and the per-pair LAP uses the
on-device auction solver during training (callback-free under SPMD) or the
exact scipy callback at eval.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.hungarian import hungarian_assign
from .cc_module import CrossClipTrackingModule


def align_clip_queries(embeddings, centers, exact: bool = True):
    """embeddings/centers: (T_clips, N, C). Sequentially Hungarian-align each
    clip's slots to the previous (matched) clip on cosine cost.
    Returns (aligned_centers (T, N, C), perms (T, N))."""
    t, n, c = embeddings.shape

    def cosine_cost(tgt, cur):
        tgt_n = tgt / jnp.maximum(
            jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-12
        )
        cur_n = cur / jnp.maximum(
            jnp.linalg.norm(cur, axis=-1, keepdims=True), 1e-12
        )
        return 1.0 - cur_n @ tgt_n.T  # (cur, tgt): rows=cur slots

    perms = [jnp.arange(n)]
    matched_emb = [embeddings[0]]
    aligned = [centers[0]]
    valid = jnp.ones((1, n), bool)
    for i in range(1, t):
        cost = cosine_cost(matched_emb[-1], embeddings[i])  # (cur, tgt)
        # assign each tgt column a cur row
        assignment = hungarian_assign(cost[None], valid, exact=exact)[0]
        perm = jnp.clip(assignment, 0)
        perms.append(perm)
        matched_emb.append(embeddings[i][perm])
        aligned.append(centers[i][perm])
    return jnp.stack(aligned), jnp.stack(perms)


class MaXTronCCModel(nn.Module):
    """images (B*T_video, H, W, 3) -> CC video outputs.

    ``segmenter`` is a KMaXSegmenter built with num_frames=num_clip_frames;
    its outputs are stop_gradient'ed (frozen, ref :104-108).
    """

    segmenter: nn.Module
    num_classes: int
    num_clip_frames: int = 2
    num_video_frames: int = 4
    cc_num_layers: int = 6
    cc_kernel_sizes: tuple = (3, 3, 3)
    cc_atrous_rates: tuple = (1, 2, 3)
    cc_attn_drop: float = 0.0
    cc_aspp_drop: float = 0.0
    cc_norm_fn: str = "ln"
    exact_matching: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        v = self.num_clip_frames
        bt = images.shape[0]
        assert bt % v == 0, "video length must be padded to a clip multiple"
        num_clips = bt // v

        embds, centers, pixels, masks, logits = [], [], [], [], []
        for ci in range(num_clips):
            clip = images[ci * v : (ci + 1) * v]
            out = self.segmenter(clip, train=False)
            out = jax.lax.stop_gradient(out)
            embds.append(out["pred_mask_embeddings"][0])  # (N, C)
            centers.append(out["cluster_centers"][0])
            pixels.append(out["pixel_feature"][0])  # (V, H, W, 128)
            masks.append(out["pred_masks"][0])  # (V, H, W, N)
            logits.append(out["pred_logits"][0])

        aligned_centers, perms = align_clip_queries(
            jnp.stack(embds), jnp.stack(centers), exact=self.exact_matching
        )  # (T, N, C)

        # stitched per-clip pixel features: (T_clips, V*H, W, C)
        pix = jnp.stack(pixels)  # (T, V, H, W, C)
        t, vv, h, w, c = pix.shape
        pix = pix.reshape(t, vv * h, w, c)

        cc_out = CrossClipTrackingModule(
            num_classes=self.num_classes,
            num_layers=self.cc_num_layers,
            num_clip_frames=v,
            kernel_sizes=self.cc_kernel_sizes,
            atrous_rates=self.cc_atrous_rates,
            attn_drop=self.cc_attn_drop,
            aspp_drop=self.cc_aspp_drop,
            norm_fn=self.cc_norm_fn,
            dtype=self.dtype,
            name="cc_module",
        )(aligned_centers.transpose(1, 0, 2)[None], pix, train=train)

        # predictor emits (T_total, H, W, N); criterion expects a batch axis
        cc_out["pred_masks"] = cc_out["pred_masks"][None]
        cc_out["aux_outputs"] = [
            {"pred_logits": a["pred_logits"], "pred_masks": a["pred_masks"][None]}
            for a in cc_out["aux_outputs"]
        ]
        cc_out["clip_pred_logits"] = jnp.stack(logits)
        cc_out["clip_pred_masks"] = jnp.concatenate(masks, axis=0)
        cc_out["clip_perms"] = perms
        return cc_out

"""Near-online (within-clip) video inference pipeline.

Re-designs the eval path of `maxtron_deeplab/maxtron_wc_model.py:278-400`:

1. host: aspect-preserving downscale (never upscale) + bottom/right zero-pad
   of normalized frames to the fixed config size (ref :224-248) — torch-exact
   bilinear, numpy;
2. device (jit, one compile per config): per-clip backbone + WC module +
   video transformer decoder -> (class logits, clip mask logits at OS4,
   per-slot mask embeddings);
3. host: ``video-wise`` stitching — Hungarian alignment of consecutive
   clips on normalized mask-embedding cosine cost (ref :337-350, 391-400),
   logit averaging;
4. device (jit, one compile per distinct original video resolution):
   upsample mask logits to padded size, crop the scaled region, resize to
   the original resolution, run the vectorized panoptic scan, and remap to
   dataset ids (VIPSeg evaluator format).

The clip loop runs in python but every clip launch is a single async device
call — the host stitching of clip t overlaps the device compute of clip t+1.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from ..ops.resize import resize_bilinear, resize_bilinear_np
from .postprocess import panoptic_inference, remap_panoptic_to_dataset_ids


def preprocess_frames(frames, pixel_mean, pixel_std, target_size):
    """frames: (T, H, W, 3) uint8/float numpy. Returns (images (T, Ht, Wt, 3)
    float32, scaled_h, scaled_w, scale_factor)."""
    t, h, w, _ = frames.shape
    th, tw = target_size
    align_corners = tw % 2 == 1
    x = (frames.astype(np.float32) - np.asarray(pixel_mean, np.float32)) / np.asarray(
        pixel_std, np.float32
    )
    scale = min(th / h, tw / w)
    scaled_h, scaled_w = h, w
    if scale < 1:
        if tw / w <= th / h:
            scaled_w, scaled_h = tw, round(h * scale)
        else:
            scaled_h, scaled_w = th, round(w * scale)
        x = resize_bilinear_np(x, (scaled_h, scaled_w), align_corners=align_corners)
    out = np.zeros((t, th, tw, 3), np.float32)
    out[:, :scaled_h, :scaled_w] = x
    return out, scaled_h, scaled_w, min(scale, 1.0)


def match_from_embds(tgt_embds: np.ndarray, cur_embds: np.ndarray) -> np.ndarray:
    """Permutation aligning current clip's slots to the previous clip's,
    by cosine cost (ref :391-400)."""
    cur = cur_embds / np.linalg.norm(cur_embds, axis=1, keepdims=True)
    tgt = tgt_embds / np.linalg.norm(tgt_embds, axis=1, keepdims=True)
    cost = 1 - cur @ tgt.T  # (cur, tgt)
    _, col = linear_sum_assignment(cost.T)  # target x current
    return col


class WCInferencePipeline:
    """Video-wise MaXTron WC inference: clips -> stitched whole-video panoptic."""

    def __init__(self, module, variables, *, num_clip_frames, input_size,
                 pixel_mean, pixel_std, thing_class_mask,
                 contiguous_to_dataset_id, label_divisor=10000,
                 pixel_confidence_threshold=0.3, class_threshold_thing=0.2,
                 class_threshold_stuff=0.3, overlap_threshold=0.8,
                 reorder_class_weight=1.0, reorder_mask_weight=1.0,
                 videowise_max_frames=16):
        self.module = module
        self.variables = variables
        self.num_clip_frames = num_clip_frames
        self.input_size = tuple(input_size)
        self.pixel_mean = pixel_mean
        self.pixel_std = pixel_std
        self.thing_class_mask = jnp.asarray(thing_class_mask)
        self.cont2ds = jnp.asarray(contiguous_to_dataset_id, jnp.int32)
        self.label_divisor = label_divisor
        # memory bound: videos longer than this are processed in windows
        # with cross-window slot re-ID (the reference instead offloads
        # chunked backbone features to CPU, `mask2former_vis_tube.py:
        # 173-202` — same goal: a 300-frame video must not blow HBM; the
        # full-resolution finalize costs ~1.2 GB/frame transient)
        self.videowise_max_frames = videowise_max_frames
        self.pp = dict(
            pixel_confidence_threshold=pixel_confidence_threshold,
            class_threshold_thing=class_threshold_thing,
            class_threshold_stuff=class_threshold_stuff,
            overlap_threshold=overlap_threshold,
            reorder_class_weight=reorder_class_weight,
            reorder_mask_weight=reorder_mask_weight,
        )

        @jax.jit
        def clip_forward(images):
            out = module.apply(variables, images, train=False)
            # (1, T, h4, w4, N) -> (T, h4, w4, N)
            return (
                out["pred_logits"][0],
                out["pred_masks"][0],
                out["pred_mask_embeddings"][0],
            )

        self._clip_forward = clip_forward
        self._finalize_cache = {}

    def _finalize_fn(self, scaled_hw, orig_hw):
        key = (scaled_hw, orig_hw)
        if key not in self._finalize_cache:
            th, tw = self.input_size
            align_corners = tw % 2 == 1
            pp = dict(self.pp)
            thing_mask = self.thing_class_mask
            cont2ds = self.cont2ds
            divisor = self.label_divisor

            @jax.jit
            def finalize(mask_cls, masks):
                # masks: (T, h4, w4, N) stitched over the whole video
                masks = resize_bilinear(masks, (th, tw), align_corners=align_corners)
                masks = masks[:, : scaled_hw[0], : scaled_hw[1]]
                if scaled_hw != orig_hw:
                    masks = resize_bilinear(masks, orig_hw, align_corners=align_corners)
                result = panoptic_inference(mask_cls, masks, thing_mask, **pp)
                ids, _ = remap_panoptic_to_dataset_ids(result, cont2ds, divisor)
                return ids, result

            self._finalize_cache[key] = finalize
        return self._finalize_cache[key]

    def run_video(self, frames: np.ndarray, orig_hw=None):
        """frames: (V, H, W, 3) uint8 numpy (whole video, any length).

        Returns (panoptic_ids (V, H', W') int32 numpy, PanopticOutput,
        per-slot embeddings numpy) with H', W' the original resolution.
        Videos longer than ``videowise_max_frames`` are processed in
        bounded windows with cross-window slot re-ID (see __init__).
        """
        if frames.shape[0] > self.videowise_max_frames:
            return self._run_video_windowed(frames, orig_hw)
        v = frames.shape[0]
        t = self.num_clip_frames
        orig_hw = orig_hw or (frames.shape[1], frames.shape[2])

        images, scaled_h, scaled_w, _ = preprocess_frames(
            frames, self.pixel_mean, self.pixel_std, self.input_size
        )

        num_clips = math.ceil(v / t)
        logits_list, masks_list, embds_list = [], [], []
        # dispatch the whole clip stream without ever blocking: device_put and
        # jit calls are async, so clip i+1's host->HBM transfer overlaps clip
        # i's compute (the double-buffered prefetch of SURVEY §7 step 5)
        for ci in range(num_clips):
            idx = [min(ci * t + k, v - 1) for k in range(t)]
            clip = jax.device_put(images[idx])
            logits, masks, embds = self._clip_forward(clip)
            logits_list.append(logits)
            masks_list.append(masks)
            embds_list.append(embds)
        embds_list = [np.asarray(e) for e in embds_list]

        # Hungarian stitching on mask-embedding cosine (host; overlaps device)
        perms = [np.arange(embds_list[0].shape[0])]
        matched_embds = [embds_list[0]]
        for i in range(1, num_clips):
            perm = match_from_embds(matched_embds[-1], embds_list[i])
            perms.append(perm)
            matched_embds.append(embds_list[i][perm])

        # Keep the full (padded) tube through panoptic inference — the
        # reference's reorder/overlap statistics run over the repeated tail
        # frames too (ref :337-366) — and trim the id map afterwards.
        stitched_masks = jnp.concatenate(
            [m[..., jnp.asarray(p)] for m, p in zip(masks_list, perms)], axis=0
        )
        avg_logits = sum(
            l[jnp.asarray(p)] for l, p in zip(logits_list, perms)
        ) / num_clips

        finalize = self._finalize_fn((scaled_h, scaled_w), tuple(orig_hw))
        ids, result = finalize(avg_logits, stitched_masks)
        return np.asarray(ids)[:v], jax.tree.map(np.asarray, result), matched_embds[0]

    def _run_video_windowed(self, frames: np.ndarray, orig_hw=None):
        """Bounded-memory whole-video inference: split into windows of
        ``videowise_max_frames``, run the video-wise path per window, and
        carry thing identities across windows by Hungarian-aligning the
        windows' slot embeddings (``match_from_embds``) — each canonical
        slot keeps one persistent instance index per category; stuff ids
        are plain category ids and merge by construction."""
        v = frames.shape[0]
        t = self.num_clip_frames
        w_len = max(t, self.videowise_max_frames
                    - self.videowise_max_frames % t)
        orig_hw = orig_hw or (frames.shape[1], frames.shape[2])

        cont2ds = np.asarray(self.cont2ds)
        div = self.label_divisor
        registry: dict = {}          # (cat_ds, canonical_slot) -> inst idx
        next_inst: dict = {}         # cat_ds -> next instance idx
        canon_embds = None
        first_embds = None
        out_ids = []
        last_result = None
        for start in range(0, v, w_len):
            window = frames[start:start + w_len]
            ids, result, embds = self.run_video(window, orig_hw)
            last_result = result
            n = embds.shape[0]
            if canon_embds is None:
                perm = np.arange(n)
                first_embds = embds
            else:
                perm = match_from_embds(canon_embds, embds)
            canon_embds = embds[perm]
            inv_perm = np.empty(n, int)
            inv_perm[perm] = np.arange(n)

            # window-local thing ids (cat*div + window_inst) -> global ids
            id_map = {}
            win_inst: dict = {}
            order = np.argsort(
                np.asarray(result.segment_id))  # acceptance order
            for si in order:
                if not bool(result.segment_valid[si]):
                    continue
                cat_ds = int(cont2ds[int(result.segment_category[si])])
                if not bool(result.segment_isthing[si]):
                    continue
                w_idx = win_inst.get(cat_ds, 0)
                win_inst[cat_ds] = w_idx + 1
                canon_slot = int(inv_perm[int(result.slot_index[si])])
                key = (cat_ds, canon_slot)
                if key not in registry:
                    registry[key] = next_inst.get(cat_ds, 0)
                    next_inst[cat_ds] = registry[key] + 1
                id_map[cat_ds * div + w_idx] = cat_ds * div + registry[key]
            if id_map:
                src = np.asarray(list(id_map))
                dst = np.asarray([id_map[k] for k in id_map])
                flat = ids.ravel()
                remapped = flat.copy()
                for s_id, d_id in zip(src, dst):
                    remapped[flat == s_id] = d_id
                ids = remapped.reshape(ids.shape)
            out_ids.append(ids)
        return (np.concatenate(out_ids, axis=0), last_result,
                first_embds)

    def run_video_clipwise(self, frames: np.ndarray, orig_hw=None):
        """``clip-wise`` inference mode (ref `maxtron_wc_model.py:316-331`):
        each clip gets its own immediate panoptic result; whole-video id
        consistency is recovered by the evaluator's re-ID stitching
        (`evaluation/vipseg_evaluator.py:stitch_clips`).

        Returns (clip_ids list of (T, H', W'), clip_embeddings list of
        {contiguous_cat: [normalized embeddings]}).
        """
        v = frames.shape[0]
        t = self.num_clip_frames
        orig_hw = orig_hw or (frames.shape[1], frames.shape[2])
        images, scaled_h, scaled_w, _ = preprocess_frames(
            frames, self.pixel_mean, self.pixel_std, self.input_size
        )
        finalize = self._finalize_fn((scaled_h, scaled_w), tuple(orig_hw))

        clip_ids, clip_embs = [], []
        for ci in range(math.ceil(v / t)):
            idx = [min(ci * t + k, v - 1) for k in range(t)]
            logits, masks, embds = self._clip_forward(jnp.asarray(images[idx]))
            ids, result = finalize(logits, masks)
            ids = np.asarray(ids)
            embds = np.asarray(embds)
            embs_by_cat: dict = {}
            valid = np.asarray(result.segment_valid)
            for ok, thing, cat, slot in zip(
                valid,
                np.asarray(result.segment_isthing),
                np.asarray(result.segment_category),
                np.asarray(result.slot_index),
            ):
                if ok and thing:
                    e = embds[slot]
                    e = e / max(np.linalg.norm(e), 1e-12)
                    embs_by_cat.setdefault(int(cat), []).append(e)
            clip_ids.append(ids)
            clip_embs.append(embs_by_cat)
        return clip_ids, clip_embs

    def extract_attention(self, frames_clip: np.ndarray):
        """Axial-trajectory attention maps for one clip (the demo_attn /
        ``visualize_attn`` use case, ref `maxtron_wc_model.py:553-656`).

        Returns (height_attn, width_attn) as returned by the WC module's
        last temporal layer: (B*W, heads, T*H, T, H) / (B*H, heads, T*W, T, W).
        """
        images, _, _, _ = preprocess_frames(
            frames_clip, self.pixel_mean, self.pixel_std, self.input_size
        )

        @jax.jit
        def attn_forward(x):
            out = self.module.apply(self.variables, x, train=False, return_attn=True)
            return out["height_traj_attn"], out["width_traj_attn"]

        h_attn, w_attn = attn_forward(jnp.asarray(images))
        return np.asarray(h_attn), np.asarray(w_attn)


class CCInferencePipeline(WCInferencePipeline):
    """Whole-video inference through ``MaXTronCCModel``: the model runs the
    frozen segmenter clip windows, the center alignment, and the cross-clip
    tracking module inside ONE jit (ref `maxtron_cc_model.py:371-403`
    windows + :262-266 pad-to-clip-multiple); this adapter only
    preprocesses frames and reuses the WC finalize (resize ->
    panoptic_inference -> dataset-id remap), so ``evaluate_vipseg`` can
    drive CC models through the identical evaluator loop."""

    def __init__(self, module, variables, **kw):
        super().__init__(module, variables, **kw)

        @jax.jit
        def video_forward(images):
            out = module.apply(variables, images, train=False)
            # pred_logits (1, N, C+1); pred_masks (1, T_total, h4, w4, N)
            return out["pred_logits"][0], out["pred_masks"][0]

        self._video_forward = video_forward

    def run_video(self, frames: np.ndarray, orig_hw=None):
        v = frames.shape[0]
        t = self.num_clip_frames
        orig_hw = orig_hw or (frames.shape[1], frames.shape[2])
        images, scaled_h, scaled_w, _ = preprocess_frames(
            frames, self.pixel_mean, self.pixel_std, self.input_size)
        pad = (-v) % t
        if pad:  # repeat the last frame to a clip multiple (ref :262-266)
            images = np.concatenate([images] + [images[-1:]] * pad, axis=0)
        logits, masks = self._video_forward(jax.device_put(images))
        finalize = self._finalize_fn((scaled_h, scaled_w), tuple(orig_hw))
        ids, result = finalize(logits, masks)
        return (np.asarray(ids)[:v], jax.tree.map(np.asarray, result), None)

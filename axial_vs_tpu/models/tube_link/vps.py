"""TubeLinkVPS: tube-based video panoptic segmentation detector family.

Re-designs `MaXTron_Tube-Link/models/video/tube_link_vps/` (T8):

- key/ref tube split training (`tube_link_vps.py:161-176`) with a
  contrastive track head on thing queries
  (`track_heads.py:1-176`, QuasiDenseMaskEmbedHeadGTMask): an MLP embeds
  matched thing queries; a multi-positive bisoftmax contrastive loss pulls
  same-instance embeddings across the key/ref tubes together;
- ``link_thing_query``: MHSA linking of the current window's thing queries
  with the previous window's (`tube_link_vps.py:178-195`), carried as
  ``pre_thing_query`` state at test time (:448-451);
- the "no-stuff-match" heads pin each stuff class to a fixed query slot and
  Hungarian-match things only
  (`mask2former_video_head_custom_no_stuff_match.py:191-193`);
- test-time panoptic stitching across windows re-IDs things by track
  embedding (quasi-dense tracker) and merges stuff by class
  (`tube_link_vps.py:556-`).
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.trajectory_attention import _dense
from ...ops.norm import LayerNorm
from ...trackers.quasi_dense import QuasiDenseEmbedTracker
from .head import MaskedMultiheadAttention, Mask2FormerVideoHeadTube


class TrackEmbedHead(nn.Module):
    """Query -> track embedding MLP (QuasiDenseMaskEmbedHeadGTMask)."""

    embed_dim: int = 256
    num_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, query):
        y = query
        for i in range(self.num_layers - 1):
            y = _dense(self.embed_dim, y.shape[-1], f"fc{i}", self.dtype)(y)
            y = nn.relu(y)
        return _dense(self.embed_dim, y.shape[-1], "fc_out", self.dtype)(y)


def multi_pos_contrastive_loss(key_embeds, ref_embeds, match_matrix,
                               temperature: float = 1.0):
    """Quasi-dense multi-positive CE (`tracker/qdtrack` losses): for each key
    embedding, softmax over all ref embeddings; positives = same instance.

    key_embeds (N, C), ref_embeds (M, C), match_matrix (N, M) float {0,1}.
    """
    logits = (key_embeds @ ref_embeds.T) / temperature
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pos = match_matrix.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos, axis=-1), 1.0)
    loss = -jnp.sum(pos * logp, axis=-1) / num_pos
    has_pos = jnp.sum(pos, axis=-1) > 0
    return jnp.sum(jnp.where(has_pos, loss, 0.0)) / jnp.maximum(
        jnp.sum(has_pos), 1.0
    )


class ThingQueryLink(nn.Module):
    """MHSA linking current thing queries with the previous window's."""

    embed_dim: int = 256
    num_heads: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, cur_query, pre_query=None):
        # cur/pre: (B, Q_thing, C)
        if pre_query is None:
            pre_query = cur_query
        ctx = jnp.concatenate([cur_query, pre_query], axis=1)
        attn = MaskedMultiheadAttention(
            embed_dims=self.embed_dim, num_heads=self.num_heads,
            dtype=self.dtype, name="link_attn",
        )(cur_query, ctx, ctx)
        x = LayerNorm(features=self.embed_dim, epsilon=1e-5, name="norm1")(
            cur_query + attn
        )
        y = _dense(self.embed_dim * 4, self.embed_dim, "ffn1", self.dtype)(x)
        y = nn.relu(y)
        y = _dense(self.embed_dim, self.embed_dim * 4, "ffn2", self.dtype)(y)
        return LayerNorm(features=self.embed_dim, epsilon=1e-5, name="norm2")(x + y)


class TubeLinkVPS(nn.Module):
    """backbone + tube head + track head + thing-query linking.

    Queries are split [0:num_thing_queries) = things (Hungarian-matched),
    [num_thing_queries:) = one fixed slot per stuff class (no-stuff-match).
    """

    backbone: nn.Module
    num_things_classes: int = 19
    num_stuff_classes: int = 0
    num_thing_queries: int = 100
    num_frames: int = 2
    use_temporal_attn: bool = True
    # 2-frame variant's ``mlp_only`` (`tube_link_vps_2frames.py:44,458-464`):
    # track embeddings are the linked queries themselves, skipping the
    # embed-MLP. (Its ``dynamic_conv_cfg`` query-update path is dead in the
    # reference: no config sets it and the KernelUpdator layer it builds is
    # absent from the vendored mmdet — deliberately not reproduced.)
    mlp_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, images, pre_thing_query=None, train: bool = False):
        feats = self.backbone(images, train=train)
        head_out = Mask2FormerVideoHeadTube(
            num_things_classes=self.num_things_classes,
            num_stuff_classes=self.num_stuff_classes,
            num_queries=self.num_thing_queries + self.num_stuff_classes,
            num_frames=self.num_frames,
            use_temporal_attn=self.use_temporal_attn,
            dtype=self.dtype,
            name="head",
        )(feats, train=train, return_query=True)

        query = head_out["query"]  # (B, Q, C)
        thing_query = query[:, : self.num_thing_queries]
        linked = ThingQueryLink(
            embed_dim=query.shape[-1], dtype=self.dtype, name="thing_link"
        )(thing_query, pre_thing_query)
        if self.mlp_only:
            embed_head = lambda q: q  # noqa: E731
        else:
            embed_head = TrackEmbedHead(
                embed_dim=query.shape[-1], dtype=self.dtype, name="track_head"
            )
        head_out["thing_query"] = linked
        head_out["thing_query_raw"] = thing_query
        head_out["track_embeds"] = embed_head(linked)
        # ref-tube side of the contrastive loss embeds UNLINKED queries
        # (ref `tube_link_vps.py:419-429`: ref_emb skips link_thing_query)
        head_out["track_embeds_raw"] = embed_head(thing_query)
        return head_out


def tube_link_vps_train_losses(module, variables, rng, batch, criterion,
                               track_temperature: float = 1.0,
                               track_weight: float = 1.0,
                               track_aux_weight: float = 1.0,
                               ref_mode: bool = False):
    """The reference's key/ref tube training step
    (`tube_link_vps.py:197-445`), static-shaped for TPU:

    - the sampled tube is split into a key tube and a ref tube (done by the
      data pipeline here — batch carries both);
    - BOTH tubes run the full head with shared params; ref-tube losses are
      suffixed ``_ref`` (ref ``add_ref_loss`` :155-159);
    - key thing queries are linked against the ref tube's
      (``link_thing_query``), then the contrastive track loss pulls
      embeddings of queries assigned to the same ``instance_id`` together
      (multi-positive bisoftmax, `tracker/qdtrack` losses) plus the qdtrack
      L2 auxiliary loss on cosine similarities.

    batch: {"key": {"images", "targets"}, "ref": {"images", "targets"}} with
    targets additionally carrying "instance_ids" (B, M) int (-1 = none/stuff).
    Returns (losses dict, total scalar, new_batch_stats) — BN running stats
    are updated by both passes (ref first, like the reference's two
    sequential forward_train calls).
    """
    key, ref = batch["key"], batch["ref"]
    r_key, r_ref = jax.random.split(rng)

    # The 2-frame variant (`tube_link_vps_2frames.py:245-339`) trains with a
    # 1-frame key tube (the current frame) against a multi-frame ref tube;
    # params are shape-independent of T, so tubes of differing length run
    # through per-length clones of the same module.
    def _tube_module(images):
        t = images.shape[0]
        return module if t == module.num_frames else module.clone(num_frames=t)

    out_ref, mut = _tube_module(ref["images"]).apply(
        variables, ref["images"], pre_thing_query=None, train=True,
        rngs={"dropout": r_ref}, mutable=["batch_stats"])
    variables = {**variables, **mut}
    out_key, mut = _tube_module(key["images"]).apply(
        variables, key["images"],
        pre_thing_query=out_ref["thing_query_raw"],
        train=True, rngs={"dropout": r_key}, mutable=["batch_stats"])
    new_batch_stats = mut.get("batch_stats", {})

    losses, key_assign = criterion(
        r_key, out_key, key["targets"], return_assign=True)
    ref_losses, ref_assign = criterion(
        r_ref, out_ref, ref["targets"], return_assign=True)
    if not ref_mode:
        # ``ref_mode=True`` drops the ref-tube segmentation losses and keeps
        # only the contrastive pair (`tube_link_vps_2frames.py:342-346`)
        losses.update({f"{k}_ref": v for k, v in ref_losses.items()})

    # ---- contrastive track loss over per-GT matched thing queries --------
    def one_video(key_emb, ref_emb, ka, ra, kt, rt):
        k_valid = (kt["valid"] & (kt["labels"] < module.num_things_classes)
                   & (ka >= 0))
        r_valid = (rt["valid"] & (rt["labels"] < module.num_things_classes)
                   & (ra >= 0))
        ke = key_emb[jnp.clip(ka, 0)]  # (M, C)
        re = ref_emb[jnp.clip(ra, 0)]
        match = (
            (kt["instance_ids"][:, None] == rt["instance_ids"][None, :])
            & (kt["instance_ids"][:, None] >= 0)
            & k_valid[:, None] & r_valid[None, :]
        )
        logits = (ke @ re.T) / track_temperature
        logits = jnp.where(r_valid[None, :], logits, -1e9)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        pos = match.astype(jnp.float32)
        has_pos = jnp.sum(pos, -1) > 0
        loss = -jnp.sum(pos * logp, -1) / jnp.maximum(jnp.sum(pos, -1), 1.0)
        loss_track = jnp.sum(jnp.where(has_pos, loss, 0.0)) / jnp.maximum(
            jnp.sum(has_pos), 1.0)
        # qdtrack L2 auxiliary: cosine similarities should match the
        # (normalized-count) match targets (tracker/qdtrack/losses l2_loss)
        kn = ke / jnp.maximum(jnp.linalg.norm(ke, axis=-1, keepdims=True), 1e-6)
        rn = re / jnp.maximum(jnp.linalg.norm(re, axis=-1, keepdims=True), 1e-6)
        cos = kn @ rn.T
        pair_valid = (k_valid[:, None] & r_valid[None, :]).astype(jnp.float32)
        aux = jnp.sum(jnp.square(cos - pos) * pair_valid) / jnp.maximum(
            jnp.sum(pair_valid), 1.0)
        return loss_track, aux

    loss_track, loss_aux = jax.vmap(one_video)(
        out_key["track_embeds"], out_ref["track_embeds_raw"],
        key_assign, ref_assign, key["targets"], ref["targets"],
    )
    losses["loss_track"] = track_weight * jnp.mean(loss_track)
    losses["loss_track_aux"] = track_aux_weight * jnp.mean(loss_aux)
    total = sum(losses.values())
    return losses, total, new_batch_stats


def stuff_fixed_assignment(num_thing_queries, num_stuff_classes, num_things_classes):
    """The no-stuff-match rule: stuff class k (contiguous id num_things + k)
    is always predicted by query slot num_thing_queries + k."""
    slots = np.arange(num_stuff_classes) + num_thing_queries
    labels = np.arange(num_stuff_classes) + num_things_classes
    return slots, labels


class TubeLinkVPSInference:
    """Window-streamed VPS: per-window tube inference, ``with_query``-family
    panoptic fusion, and ``match_panoptic`` id-carry across windows.

    Mirrors the reference's VPS test path: per-frame fusion returns
    (pan_map, [(query_index, pan_id)]) (`maskformer_fusion_head.py:99-167`,
    mode per `configs/video/vipseg/vipseg_tb_r50_8e.py:130`), then
    `tube_link_vps.py:556-` unions the window's thing queries, embeds them
    through the track head, matches against tracker memory and rewrites
    each frame's pan ids to ``cls + (track_id + 1) * INSTANCE_OFFSET``
    (untracked segments fall to instance id 0; stuff ids are plain class
    ids and merge across windows by construction).
    """

    def __init__(self, module, variables, *, clip_len, num_things_classes,
                 num_stuff_classes, label_divisor=None, score_thr=0.3,
                 panoptic_mode="with_query", object_mask_thr=None,
                 iou_thr=0.8, tracker_kwargs=None):
        from .fusion import INSTANCE_OFFSET

        self.module = module
        self.variables = variables
        self.clip_len = clip_len
        self.num_things = num_things_classes
        self.num_stuff = num_stuff_classes
        self.num_classes = num_things_classes + num_stuff_classes
        self.label_divisor = label_divisor or INSTANCE_OFFSET
        self.score_thr = score_thr
        self.panoptic_mode = panoptic_mode
        self.object_mask_thr = (
            object_mask_thr if object_mask_thr is not None
            else (0.3 if panoptic_mode == "sort_with_query" else 0.8))
        self.iou_thr = iou_thr
        self.tracker = QuasiDenseEmbedTracker(**(tracker_kwargs or {}))
        self._pre_thing_query = None

        @jax.jit
        def window_forward(images, pre_thing_query):
            out = module.apply(
                variables, images, pre_thing_query=pre_thing_query, train=False
            )
            return (
                out["cls_preds"][-1][0],
                out["mask_preds"][-1][0],
                out["track_embeds"][0],
                out["thing_query"],
            )

        self._window_forward = window_forward

    def init_memory(self):
        self.tracker.reset()
        self._pre_thing_query = None

    def process_window(self, images: np.ndarray, frame_id: int):
        """images (T, H, W, 3) -> (T, h, w) panoptic id maps in the
        reference convention: void = num_classes, stuff = class id, thing
        = class + (track_id + 1) * label_divisor (untracked -> inst 0)."""
        from .fusion import panoptic_fusion

        pre = self._pre_thing_query
        if pre is None:
            pre = jnp.zeros((1, 0, 256), jnp.float32)
        cls_logits, masks, embeds, thing_query = self._window_forward(
            jnp.asarray(images), pre
        )
        self._pre_thing_query = thing_query

        cls_logits = np.asarray(cls_logits, np.float32)  # (Q, K+1)
        masks = np.asarray(masks, np.float32)            # (T, Q, h, w)
        embeds = np.asarray(embeds, np.float32)          # (Q_thing, C)
        t, q, h, w = masks.shape
        off = self.label_divisor
        n_thing_q = embeds.shape[0]

        # per-frame fusion with per-segment query indices
        pans, qlists = [], []
        for ti in range(t):
            pan, qlist = panoptic_fusion(
                self.panoptic_mode, cls_logits, masks[ti],
                self.num_things, self.num_classes,
                object_mask_thr=self.object_mask_thr, iou_thr=self.iou_thr,
            )
            pans.append(pan)
            qlists.append(qlist)

        # union of the window's thing (query, pan_id) pairs; only thing
        # query slots carry track embeddings (no-stuff-match head)
        pairs = sorted({(qi, pid) for ql in qlists for qi, pid in ql
                        if qi < n_thing_q})
        if not pairs:
            return np.stack(pans)
        clip_query_inds = np.asarray([p[0] for p in pairs], int)
        clip_pan_ids = np.asarray([p[1] for p in pairs], np.int64)
        clip_labels = (clip_pan_ids % off).astype(int)

        prob = np.asarray(jax.nn.softmax(jnp.asarray(cls_logits), -1))
        scores = prob[clip_query_inds, clip_labels]
        track_ids = self.tracker.match(
            embeds[clip_query_inds], clip_labels, scores, frame_id)

        # rewrite pan ids: tracked -> cls + (tid + 1) * OFF, untracked -> 0
        for pan in pans:
            src = pan.copy()
            for idx, pid in enumerate(clip_pan_ids):
                tid = int(track_ids[idx]) if idx < len(track_ids) else -1
                new_inst = tid + 1 if tid >= 0 else 0
                pan[src == pid] = clip_labels[idx] + new_inst * off
        return np.stack(pans)

    def process_window_instance(self, images: np.ndarray, frame_id: int,
                                max_per_frame: int = 30,
                                score_thr: float | None = None):
        """VIS-style cross-window instance id-carry (the reference's
        ``match_instance``, `tube_link_vps.py:638-679`): the window's thing
        queries above ``score_thr`` become per-frame instance results, the
        UNIQUE query set is embedded through the track head and matched
        against tracker memory, and every detection carries its persistent
        track id (the reference writes ``new_ids + 1001`` into the bbox id
        column — the +1000 only namespaces ids away from panoptic labels in
        mmdet's encoding; here ids are returned directly).

        Returns a list of ``{"labels", "scores", "masks", "track_ids"}``
        per frame (masks (K, h, w) bool; track_ids -1 = unmatched/dropped).
        """
        pre = self._pre_thing_query
        if pre is None:
            pre = jnp.zeros((1, 0, 256), jnp.float32)
        cls_logits, masks, embeds, thing_query = self._window_forward(
            jnp.asarray(images), pre)
        self._pre_thing_query = thing_query

        cls_logits = np.asarray(cls_logits, np.float32)
        masks = np.asarray(masks, np.float32)      # (T, Q, h, w)
        embeds = np.asarray(embeds, np.float32)    # (Q_thing, C)
        n_thing_q = embeds.shape[0]
        thr = self.score_thr if score_thr is None else score_thr

        prob = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
        prob /= prob.sum(-1, keepdims=True)
        thing_prob = prob[:n_thing_q, : self.num_things]  # (Q_th, K_th)
        scores = thing_prob.max(-1)
        labels = thing_prob.argmax(-1)
        keep = np.nonzero(scores > thr)[0][:max_per_frame]

        track_ids = (self.tracker.match(
            embeds[keep], labels[keep], scores[keep], frame_id)
            if len(keep) else np.zeros((0,), np.int64))

        out = []
        for ti in range(masks.shape[0]):
            out.append(dict(
                labels=labels[keep].astype(np.int64),
                scores=scores[keep].astype(np.float32),
                masks=masks[ti, keep] > 0,
                track_ids=np.asarray(track_ids, np.int64),
            ))
        return out

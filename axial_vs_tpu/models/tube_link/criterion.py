"""Tube-Link (Mask2Former) losses: Hungarian assignment + CE/dice/point-BCE.

Re-designs the mmdet-config loss stack the reference wires per-head
(`configs/video/ytvis21/ytvis21_r50_maxtron_wc_5k_10k_15k.py:95-112`,
`mask2former_video_head.py:202-420`): MaskHungarianAssigner with
[classification cost x2, point-sampled sigmoid-BCE mask cost x5, naive-dice
cost x5], then per-layer losses: softmax CE with background weight 0.1,
uncertainty-sampled point BCE (12544 pts, oversample 3.0, importance 0.75,
PointRend-style) and naive dice — averaged over the total GT count.

Tube masks: predictions (B, T, Q, H, W), GT (B, M, T, H, W); points are
sampled per (tube, frame) jointly by flattening T into the point space.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.hungarian import hungarian_assign


def _sample_points(masks_flat, point_idx):
    """masks_flat (B, N, S); point_idx (B, P) -> (B, N, P)."""
    return jnp.take_along_axis(masks_flat, point_idx[:, None, :], axis=2)


def _dice_loss(pred, target, eps=1e-3):
    """naive dice on sampled points: pred sigmoid probs (..., P)."""
    num = 2 * jnp.sum(pred * target, -1)
    den = jnp.sum(pred, -1) + jnp.sum(target, -1)
    return 1 - (num + eps) / (den + eps)


def uncertainty_point_idx(rng, mask_logits, num_points, oversample=3.0,
                          importance=0.75):
    """PointRend-style sampling over the flattened (T*H*W) space:
    importance fraction taken from the most uncertain (|logit| smallest) of
    oversampled random candidates, rest uniform."""
    b, s = mask_logits.shape
    n_over = int(num_points * oversample)
    n_imp = int(num_points * importance)
    n_rand = num_points - n_imp
    r1, r2 = jax.random.split(rng)
    cand = jax.random.randint(r1, (b, n_over), 0, s)
    unc = -jnp.abs(jnp.take_along_axis(mask_logits, cand, axis=1))
    _, top = jax.lax.top_k(unc, n_imp)
    imp_idx = jnp.take_along_axis(cand, top, axis=1)
    rand_idx = jax.random.randint(r2, (b, n_rand), 0, s)
    return jnp.concatenate([imp_idx, rand_idx], axis=1)


class TubeLinkCriterion:
    """``stuff_fixed=True`` reproduces the reference's "no-stuff-match" VPS
    heads (`models/video/tube_link_vps/mask2former_video_head_custom_no_stuff_match.py:191-193`):
    queries [0, Q-num_stuff) are Hungarian-matched against THING GTs only,
    and stuff class k is pinned to query slot Q-num_stuff+k (dense targets,
    no assignment). ``loss_split=True`` additionally emits separate
    thing_/stuff_ loss keys (ref ``loss_split_thing_stuff`` :696-751,
    enabled by `configs/video/vipseg/vipseg_tb_r50_8e.py:33-40`)."""

    def __init__(self, num_things, num_stuff=0, cls_weight=2.0, mask_weight=5.0,
                 dice_weight=5.0, bg_cls_weight=0.1, num_points=12544,
                 oversample=3.0, importance=0.75, match_points=12544,
                 exact_matching=True, stuff_fixed=False, loss_split=False):
        self.num_things = num_things
        self.num_stuff = num_stuff
        self.num_classes = num_things + num_stuff
        self.cls_weight = cls_weight
        self.mask_weight = mask_weight
        self.dice_weight = dice_weight
        self.bg_cls_weight = bg_cls_weight
        self.num_points = num_points
        self.oversample = oversample
        self.importance = importance
        self.match_points = match_points
        self.exact_matching = exact_matching
        self.stuff_fixed = stuff_fixed and num_stuff > 0
        self.loss_split = loss_split

    def _match(self, rng, cls_pred, masks_flat, gt_flat, gt_labels, valid):
        """cls_pred (B,Q,K+1); masks_flat (B,Q,S); gt_flat (B,M,S)."""
        b, q, s = masks_flat.shape
        pts = jax.random.randint(rng, (b, min(self.match_points, s)), 0, s)
        pm = jax.lax.stop_gradient(_sample_points(masks_flat, pts))
        gm = _sample_points(gt_flat, pts)
        prob = jax.nn.softmax(
            jax.lax.stop_gradient(cls_pred).astype(jnp.float32), -1
        )
        cls_cost = -jnp.take_along_axis(
            prob, jnp.clip(gt_labels, 0, self.num_classes)[:, None, :], axis=2
        )  # (B, Q, M)
        p = jax.nn.sigmoid(pm.astype(jnp.float32))
        # pointwise BCE cost (mean over points)
        bce = (
            jnp.einsum("bqp,bmp->bqm", jax.nn.softplus(pm.astype(jnp.float32)), gm)
            + jnp.einsum(
                "bqp,bmp->bqm",
                jax.nn.softplus(-pm.astype(jnp.float32)) + pm.astype(jnp.float32),
                1 - gm,
            )
        ) / pm.shape[-1]
        num = 2 * jnp.einsum("bqp,bmp->bqm", p, gm)
        den = jnp.sum(p, -1)[:, :, None] + jnp.sum(gm, -1)[:, None, :]
        dice_cost = 1 - (num + 1e-3) / (den + 1e-3)
        cost = (
            self.cls_weight * cls_cost
            + self.mask_weight * bce
            + self.dice_weight * dice_cost
        )
        cost = jnp.where(valid[:, None, :], cost, 0.0)
        return hungarian_assign(cost, valid, exact=self.exact_matching)

    def _stuff_dense_loss(self, rng, cls_pred, masks_flat, gt_flat, labels,
                          valid):
        """Pinned stuff slots (no assignment): stuff class k is predicted by
        the k-th of the LAST num_stuff queries. Returns separate loss dict.

        cls_pred (B, Q, K+1); masks_flat (B, Q, S); gt_flat (B, M, S)."""
        b, q, s = masks_flat.shape
        ns = self.num_stuff
        stuff_slots = masks_flat[:, q - ns:]           # (B, ns, S)
        stuff_cls = cls_pred[:, q - ns:]               # (B, ns, K+1)

        # scatter GT tubes onto their fixed class slot
        onehot = (
            (labels[:, :, None] - self.num_things
             == jnp.arange(ns)[None, None, :])
            & valid[:, :, None]
            & (labels[:, :, None] >= self.num_things)
        )  # (B, M, ns)
        present = jnp.any(onehot, axis=1)              # (B, ns)
        stuff_gt = jnp.einsum(
            "bmk,bms->bks", onehot.astype(jnp.float32), gt_flat)
        stuff_gt = jnp.minimum(stuff_gt, 1.0)

        # classification: present slots -> their class id, absent -> bg
        tgt = jnp.where(
            present, jnp.arange(ns)[None, :] + self.num_things,
            self.num_classes,
        )
        logp = jax.nn.log_softmax(stuff_cls.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        cls_w = jnp.where(tgt == self.num_classes, self.bg_cls_weight, 1.0)
        loss_cls = jnp.sum(ce * cls_w) / jnp.maximum(jnp.sum(cls_w), 1.0)

        num_pos = jnp.maximum(jnp.sum(present), 1.0)
        pts = uncertainty_point_idx(
            rng, stuff_slots.reshape(-1, s), min(self.num_points, s),
            self.oversample, self.importance,
        ).reshape(b, ns, -1)
        pp = jnp.take_along_axis(stuff_slots, pts, axis=2).astype(jnp.float32)
        gp = jnp.take_along_axis(stuff_gt, pts, axis=2)
        vm = present[:, :, None]
        bce = jnp.where(vm, jax.nn.softplus(jnp.where(gp > 0, -pp, pp)), 0.0)
        loss_mask = jnp.sum(bce) / (num_pos * pp.shape[-1])
        dice = _dice_loss(jax.nn.sigmoid(pp), gp)
        loss_dice = jnp.sum(jnp.where(present, dice, 0.0)) / num_pos
        return {
            "loss_cls": self.cls_weight * loss_cls,
            "loss_mask": self.mask_weight * loss_mask,
            "loss_dice": self.dice_weight * loss_dice,
        }

    def _layer_loss(self, rng, cls_pred, mask_pred, targets,
                    return_assign=False):
        """mask_pred (B, T, Q, H, W); targets: labels (B,M), masks
        (B,M,T,H,W), valid (B,M)."""
        b, t, q, h, w = mask_pred.shape
        masks_flat = mask_pred.transpose(0, 2, 1, 3, 4).reshape(b, q, -1)
        gt = targets["masks"].astype(jnp.float32)
        gt_flat = gt.reshape(b, gt.shape[1], -1)
        valid = targets["valid"]
        labels = targets["labels"]

        if self.stuff_fixed:
            # things: Hungarian over the first Q-num_stuff slots x thing GTs;
            # stuff: dense fixed-slot targets (separate loss terms)
            r1, r2, r3 = jax.random.split(rng, 3)
            q_th = q - self.num_stuff
            thing_valid = valid & (labels < self.num_things)
            th = self._layer_loss_matched(
                r1, r2, cls_pred[:, :q_th], masks_flat[:, :q_th], gt_flat,
                labels, thing_valid, return_assign=return_assign,
            )
            if return_assign:
                th, assign = th
            st = self._stuff_dense_loss(
                r3, cls_pred, masks_flat, gt_flat, labels, valid)
            if self.loss_split:
                out = {f"thing_{k}": v for k, v in th.items()}
                out.update({f"stuff_{k}": v for k, v in st.items()})
            else:
                out = {k: th[k] + st[k] for k in th}
            return (out, assign) if return_assign else out

        r1, r2 = jax.random.split(rng)
        out = self._layer_loss_matched(
            r1, r2, cls_pred, masks_flat, gt_flat, labels, valid,
            return_assign=return_assign,
        )
        return out

    def _layer_loss_matched(self, r1, r2, cls_pred, masks_flat, gt_flat,
                            labels, valid, return_assign=False):
        b, q, _ = masks_flat.shape
        assign = self._match(r1, cls_pred, masks_flat, gt_flat, labels, valid)
        safe = jnp.clip(assign, 0)
        batch_idx = jnp.arange(b)[:, None]

        # classification: assigned slots get GT labels, rest background
        tgt_cls = jnp.full((b, q), self.num_classes, jnp.int32).at[
            batch_idx, jnp.where(valid, safe, q)
        ].set(labels.astype(jnp.int32), mode="drop")
        logp = jax.nn.log_softmax(cls_pred.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
        cls_w = jnp.where(tgt_cls == self.num_classes, self.bg_cls_weight, 1.0)
        loss_cls = jnp.sum(ce * cls_w) / jnp.maximum(jnp.sum(cls_w), 1.0)

        # mask losses on matched pairs only
        matched_pred = masks_flat[batch_idx, safe]  # (B, M, S)
        num_gt = jnp.maximum(jnp.sum(valid), 1.0)
        pts = uncertainty_point_idx(
            r2, matched_pred.reshape(-1, matched_pred.shape[-1]),
            min(self.num_points, matched_pred.shape[-1]),
            self.oversample, self.importance,
        ).reshape(b, valid.shape[1], -1)
        pp = jnp.take_along_axis(matched_pred, pts, axis=2).astype(jnp.float32)
        gp = jnp.take_along_axis(gt_flat, pts, axis=2)
        vm = valid[:, :, None]
        # numerically-stable BCE-with-logits: softplus(-x) for target 1,
        # softplus(x) for target 0
        bce = jnp.where(vm, jax.nn.softplus(jnp.where(gp > 0, -pp, pp)), 0.0)
        loss_mask = jnp.sum(bce) / (num_gt * pp.shape[-1])
        dice = _dice_loss(jax.nn.sigmoid(pp), gp)
        loss_dice = jnp.sum(jnp.where(valid, dice, 0.0)) / num_gt
        out = {
            "loss_cls": self.cls_weight * loss_cls,
            "loss_mask": self.mask_weight * loss_mask,
            "loss_dice": self.dice_weight * loss_dice,
        }
        return (out, assign) if return_assign else out

    def __call__(self, rng, outputs, targets, return_assign=False):
        """return_assign=True additionally returns the LAST layer's thing
        assignment (B, M) — query slot per GT, -1 unmatched — used by the
        VPS key/ref contrastive track loss (vps.py)."""
        losses = {}
        last_assign = None
        n_layers = len(outputs["cls_preds"])
        for i, (cls_pred, mask_pred) in enumerate(
            zip(outputs["cls_preds"], outputs["mask_preds"])
        ):
            rng, sub = jax.random.split(rng)
            is_last = i == n_layers - 1
            l = self._layer_loss(
                sub, cls_pred, mask_pred, targets,
                return_assign=return_assign and is_last,
            )
            if return_assign and is_last:
                l, last_assign = l
            if is_last:
                losses.update(l)
            else:
                losses.update({f"d{i}.{k}": v for k, v in l.items()})
        if return_assign:
            return losses, last_assign
        return losses

    def total(self, losses):
        return sum(losses.values())

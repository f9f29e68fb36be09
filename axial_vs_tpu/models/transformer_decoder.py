"""kMaX / MaXTron transformer decoder, TPU-native.

Re-designs `kmax_deeplab/modeling/transformer_decoder/kmax_transformer_decoder.py`
(`kMaXTransformerDecoder` :316-467) and its video variant
`maxtron_deeplab/modeling/transformer_decoder/maxtron_transformer_decoder.py`
(`MaXTronTransformerDecoder` :415-601) as ONE module: with ``num_frames > 1``
the per-frame pixel features (B*T, H, W, C) are folded into the height axis
(b t) h w c -> b (t h) w c so the k-means clustering spans the whole clip
(ref video :533,546), and per-clip mask-embedding outputs are added for
cross-clip matching (ref video :555-578).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers.convbn import ConvBN
from ..layers.kmax_layers import KMaXPredictor, KMaXTransformerLayer, SemanticPredictor
from ..ops.init import trunc_normal
from ..ops.resize import resize_bilinear


def _fold_time(x, num_frames: int):
    """(B*T, H, W, C) -> (B, T*H, W, C)."""
    bt, h, w, c = x.shape
    b = bt // num_frames
    return x.reshape(b, num_frames * h, w, c)


class KMaXTransformerDecoder(nn.Module):
    """Dual-path transformer decoder over [OS32, OS16, OS8] pixel features."""

    num_classes: int  # without void
    dec_layers: Sequence[int] = (2, 2, 2)
    num_queries: int = 128
    drop_path_prob: float = 0.0
    add_aux_semantic_pred: bool = False
    use_aux_semantic_decoder: bool = True
    num_frames: int = 1  # > 1 -> video (MaXTron) variant
    dtype: Any = None

    @nn.compact
    def __call__(self, multi_scale_features, panoptic_features, semantic_features,
                 train: bool = False):
        t = self.num_frames
        bt = multi_scale_features[0].shape[0]
        b = bt // t

        cluster_centers = self.param(
            "cluster_centers", trunc_normal(std=1.0), (self.num_queries, 256), jnp.float32
        )
        query = jnp.broadcast_to(
            cluster_centers[None], (b, self.num_queries, 256)
        ).astype(self.dtype or jnp.float32)

        predictions_class = []
        predictions_mask = []
        predictions_pixel = []

        layer_idx = 0
        for i, feat in enumerate(multi_scale_features):
            if t > 1:
                feat = _fold_time(feat, t)
            for _ in range(self.dec_layers[i]):
                query, pred = KMaXTransformerLayer(
                    num_classes=self.num_classes + 1,
                    drop_path_prob=self.drop_path_prob,
                    dtype=self.dtype,
                    name=f"layer{layer_idx}",
                )(pixel_feature=feat, query_feature=query, train=train)
                predictions_class.append(pred["class_logits"])
                predictions_mask.append(pred["mask_logits"])
                predictions_pixel.append(pred["pixel_feature"])
                layer_idx += 1

        class_embeddings = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            conv_type="1d", dtype=self.dtype, name="class_embedding_projection",
        )(query, train=train)
        mask_embeddings = ConvBN(
            256, kernel_size=1, use_bias=False, norm="syncbn", act="gelu",
            conv_type="1d", dtype=self.dtype, name="mask_embedding_projection",
        )(query, train=train)

        pano = _fold_time(panoptic_features, t) if t > 1 else panoptic_features
        final = KMaXPredictor(
            num_classes=self.num_classes + 1, dtype=self.dtype, name="predictor"
        )(
            mask_embeddings=mask_embeddings,
            class_embeddings=class_embeddings,
            pixel_feature=pano,
            train=train,
        )
        predictions_class.append(final["class_logits"])
        predictions_mask.append(final["mask_logits"])
        predictions_pixel.append(final["pixel_feature"])

        def unfold(x):
            # (B, T*H, W, K) -> (B, T, H, W, K)
            if t == 1:
                return x
            _, th, w, k = x.shape
            return x.reshape(b, t, th // t, w, k)

        target_hw = predictions_mask[-1].shape[-3:-1]  # (T*H, W) folded
        align_corners = target_hw[-1] % 2 == 1

        # Aux masks are resized to the final (per-frame) resolution. For t > 1
        # the reference uses a trilinear resize to (T, H, W) (video ref
        # :593-601); T matches across layers, so a per-frame bilinear resize
        # after unfolding is exactly equivalent (and never mixes frames).
        final_hw = (target_hw[0] // t, target_hw[1])
        aux_outputs = []
        for c, m, p in zip(
            predictions_class[:-1], predictions_mask[:-1], predictions_pixel[:-1]
        ):
            m = resize_bilinear(unfold(m), final_hw, align_corners=align_corners)
            p = resize_bilinear(unfold(p), final_hw, align_corners=align_corners)
            aux_outputs.append({"pred_logits": c, "pred_masks": m, "pixel_feature": p})

        out = {
            "pred_logits": final["class_logits"],
            "pred_masks": unfold(final["mask_logits"]),
            "pixel_feature": unfold(final["pixel_feature"]),
            "aux_outputs": aux_outputs,
        }
        if t > 1:
            # per-clip outputs for cross-clip matching (video ref :566-578):
            # the 128-d mask kernels, NOT the 256-d projection
            out["pred_mask_embeddings"] = final["mask_embeddings"]  # (B, N, 128)
            out["cluster_centers"] = query  # (B, N, 256)

        if self.add_aux_semantic_pred and train:
            sem, os8, os4 = semantic_features
            if self.use_aux_semantic_decoder:
                aux_sem = SemanticPredictor(
                    num_classes=self.num_classes + 1, dtype=self.dtype,
                    name="auxiliary_semantic_predictor",
                )(sem, low_features_os8=os8, low_features_os4=os4, train=train)
            else:
                in_ch = sem.shape[-1]
                aux_sem = ConvBN(in_ch, kernel_size=5, padding=2, groups=in_ch,
                                 use_bias=False, norm="syncbn", act="gelu",
                                 conv_init="xavier_uniform", dtype=self.dtype,
                                 name="aux_sem_conv0")(sem, train=train)
                aux_sem = ConvBN(256, kernel_size=1, use_bias=False, norm="syncbn",
                                 act="gelu", dtype=self.dtype, name="aux_sem_conv1")(
                    aux_sem, train=train)
                aux_sem = ConvBN(self.num_classes, kernel_size=1, use_bias=True,
                                 norm=None, act=None, conv_init_std=0.01,
                                 dtype=self.dtype, name="aux_sem_conv2")(aux_sem, train=train)
            if t > 1:
                aux_sem = unfold(_fold_time(aux_sem, t))
            out["aux_semantic_pred"] = aux_sem
        return out

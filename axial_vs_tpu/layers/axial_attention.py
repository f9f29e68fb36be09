"""1-D axial attention with learned relative positional encodings.

TPU-native re-design of the reference's ``AxialAttention``/``AxialAttention2D``
(`kmax_deeplab/modeling/pixel_decoder/kmax_pixel_decoder.py:75-190`, itself a
port of deeplab2 axial_layers): height-axis then width-axis single-axis
attention with query/key/value relative positional embeddings (MAX_SPAN=255)
and BatchNorm-normalized similarity logits.

Layout: channels-last. The (N*W, C, H) / (N*H, C, W) torch batching becomes
plain leading batch dims on (…, L, C) arrays; all contractions are einsums
the MXU eats directly, and the softmax runs in fp32 as the reference pins it
(`kmax_pixel_decoder.py:144-145`).
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..ops.init import trunc_normal
from ..ops.norm import BatchNorm, ChannelBatchNorm
from .convbn import ConvBN

MAX_SPAN = 255

# similarity/retrieve formulation for the eval fast path:
#   dot  — batched einsum dots (MXU) — the DEFAULT.
#   vpu  — broadcast-multiply + fused reduce. Hypothesis was that short
#          axial sequences waste the MXU (each (L, dk)x(dk, M) dot pads
#          to a mostly-idle 128x128 tile); MEASURED 3.4x SLOWER on v5e
#          (5.00 vs 1.45 ms/block, 5 chained stage-1 blocks at (2, 49,
#          85, 256), tools/bench_axial.py): the fused reduce streams the
#          (n, l, m, h, d) product at 8-lane granularity and loses to
#          XLA's batched-dot pipeline. Kept for other geometries.
_AXIAL_SIM_MODE = os.environ.get("AXIALVS_AXIAL_SIM", "dot")


def _use_vpu_similarity(length: int, dk: int) -> bool:
    return _AXIAL_SIM_MODE == "vpu"


def compute_relative_distance_matrix(query_length: int, key_length: int) -> np.ndarray:
    """Static (L, M) matrix of shifted relative distances indexing the RPE table.

    Mirrors `kmax_pixel_decoder.py:76-85`.
    """
    if (key_length - query_length) % 2:
        raise ValueError("key_length must be query_length + 2 * flange")
    key_index = np.arange(key_length)
    query_index = np.arange(query_length) + (key_length - query_length) // 2
    distance = key_index[None, :] - query_index[:, None]
    return distance + MAX_SPAN - 1


class RelativePositionalEncoding(nn.Module):
    """Gathers (L, M, depth) relative embeddings from a (2*MAX_SPAN-1, depth) table."""

    query_length: int
    key_length: int
    depth: int

    @nn.compact
    def __call__(self):
        table = self.param(
            "embeddings", trunc_normal(std=1.0), (MAX_SPAN * 2 - 1, self.depth), jnp.float32
        )
        idx = compute_relative_distance_matrix(self.query_length, self.key_length)
        return table[jnp.asarray(idx.reshape(-1))].reshape(
            self.query_length, self.key_length, self.depth
        )


class _BNFoldParams(nn.Module):
    """Param-owner twin of ops.norm.BatchNorm: declares the identical
    {params: scale, bias} + {batch_stats: mean, var} tree and returns the
    eval-time FOLDED affine (s, b) with y = x * s + b.

    At eval BatchNorm is a per-channel affine, so the similarity path's
    ``concat -> BN -> reshape -> sum`` over the (N, L, M, 3h) tensor — the
    largest intermediate of the attention — can be folded into pre-scaled
    einsum operands instead (see AxialAttention.__call__). Training keeps
    the real BatchNorm (it needs batch statistics of the concatenated
    similarities).
    """

    features: int
    epsilon: float = 1e-3  # ops.norm.BN_EPS

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        import jax

        s = scale * jax.lax.rsqrt(var.value + self.epsilon)
        return s, bias - mean.value * s


class AxialAttention(nn.Module):
    """Single-axis attention over (..., L, C) with q/k/v RPE and BN'd logits.

    ``batch_minor=True`` takes x as (N, L, W, C) — the attention runs along
    L with W as an extra batch dim kept IN PLACE, so the height axis of
    AxialAttention2D needs no (N, H, W, C) -> (N*W, H, C) transpose (a
    measured ~0.15 ms/block relayout at stage-1 geometry); the einsums
    carry the batch dim instead. Eval only (the train path keeps the
    flattened layout for the similarity BatchNorm's batch statistics)."""

    query_shape: int
    total_key_depth: int = 512
    total_value_depth: int = 1024
    num_heads: int = 8
    # (N,3h,L,M) similarity layout. Measured SLOWER on v5e than the
    # head-minor default (3.03 vs 2.71 ms/block at stage-1 geometry): XLA
    # already fuses the head-minor path well and the head-batched einsums
    # add relayouts. Kept as an option for other geometries.
    head_batched: bool = False
    batch_minor: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.batch_minor:
            return self._batch_minor_eval(x)
        # x: (N, L, C)
        n, length, _ = x.shape
        h = self.num_heads
        dk = self.total_key_depth // h
        dv = self.total_value_depth // h
        in_planes = x.shape[-1]

        qkv = ConvBN(
            self.total_key_depth * 2 + self.total_value_depth,
            kernel_size=1,
            use_bias=False,
            norm=None,
            act=None,
            conv_type="1d",
            conv_init_std=in_planes ** -0.5,
            dtype=self.dtype,
            name="qkv_transform",
        )(x, train=train)
        qkv = BatchNorm(
            features=qkv.shape[-1], dtype=self.dtype, name="batch_norm_qkv"
        )(qkv, train=train)

        q = qkv[..., : self.total_key_depth].reshape(n, length, h, dk)
        k = qkv[..., self.total_key_depth : 2 * self.total_key_depth].reshape(
            n, length, h, dk
        )
        v = qkv[..., 2 * self.total_key_depth :].reshape(n, length, h, dv)

        query_rpe = RelativePositionalEncoding(length, length, dk, name="query_rpe")()
        key_rpe = RelativePositionalEncoding(length, length, dk, name="key_rpe")()
        value_rpe = RelativePositionalEncoding(length, length, dv, name="value_rpe")()

        if self.head_batched:
            # head-BATCHED similarity layout (N, 3h, L, M): with the head
            # axis minor every similarity-path op runs on 8-24 of 128
            # lanes; keeping L*M minor uses the VPU fully. BN matches the
            # reference's `_batch_norm_similarity` over (N, 3h, L, M).
            content_sim = jnp.einsum("nlhd,nmhd->nhlm", q, k)
            query_rpe_sim = jnp.einsum(
                "nlhd,lmd->nhlm", q, query_rpe.astype(q.dtype))
            key_rpe_sim = jnp.einsum(
                "nmhd,lmd->nhlm", k, key_rpe.astype(k.dtype))
            # channel order = type-major (content | query | key), each h
            # wide — identical to the head-minor concat layout
            sim = jnp.concatenate(
                [content_sim, query_rpe_sim, key_rpe_sim], axis=1)
            sim = ChannelBatchNorm(
                features=3 * h, axis=1, dtype=self.dtype,
                name="batch_norm_similarity",
            )(sim, train=train)
            logits = sim.reshape(n, 3, h, length, length).sum(axis=1)
            weights = nn.softmax(logits.astype(jnp.float32), axis=3)
            weights = weights.astype(v.dtype)

            retrieved_content = jnp.einsum(
                "nhlm,nmhd->nlhd", weights, v).reshape(
                n, length, self.total_value_depth)
            retrieved_rpe = jnp.einsum(
                "nhlm,lmd->nlhd", weights, value_rpe.astype(weights.dtype)
            ).reshape(n, length, self.total_value_depth)
        elif not train:
            # eval fast path: BatchNorm is an affine at eval, so the
            # ``concat -> BN -> reshape -> sum`` over the (N, L, M, 3h)
            # similarity tensor folds into PRE-SCALED einsum operands, and
            # the retrieved-output BN+sum folds into two scaled adds —
            # removes every elementwise pass over the attention's largest
            # intermediates (profiled ~0.3 ms/axis at stage-1 geometry).
            # Param/variable trees are identical to the train branch.
            s3, b3 = _BNFoldParams(3 * h, name="batch_norm_similarity")()
            s3 = s3.astype(q.dtype)
            q_c = q * s3[None, None, 0 * h:1 * h, None]
            q_r = q * s3[None, None, 1 * h:2 * h, None]
            k_r = k * s3[None, None, 2 * h:3 * h, None]
            # the folded BN bias is constant along the softmax (m) axis,
            # so softmax is invariant to it — omit it entirely
            del b3
            qr = query_rpe.astype(q.dtype)
            kr = key_rpe.astype(k.dtype)
            vr = value_rpe
            tv = self.total_value_depth
            if _use_vpu_similarity(length, dk):
                # (L, M) axial geometries are tiny for the MXU: each
                # batched (L, dk)x(dk, M) similarity dot pads to a 128x128
                # tile and wastes >85% of the array. Broadcast-multiply +
                # reduce runs the same contraction on the VPU inside ONE
                # fused pass (the (n, l, m, h, d) intermediate never
                # reaches HBM). Measured v5e, 5 chained stage-1 blocks
                # (L, M = 49, 85): see tools/bench_axial.py.
                f32 = jnp.float32
                logits = (
                    (q_c[:, :, None, :, :] * k[:, None, :, :, :]).sum(-1, dtype=f32)
                    + (q_r[:, :, None, :, :] * qr[None, :, :, None, :]).sum(-1, dtype=f32)
                    + (k_r[:, None, :, :, :] * kr[None, :, :, None, :]).sum(-1, dtype=f32)
                )
                weights = nn.softmax(logits, axis=2)
                weights = weights.astype(v.dtype)
                retrieved_content = (
                    weights[..., None] * v[:, None]).sum(
                    2, dtype=f32).astype(v.dtype).reshape(n, length, tv)
                retrieved_rpe = (
                    weights[..., None]
                    * vr.astype(weights.dtype)[None, :, :, None, :]
                ).sum(2, dtype=f32).astype(v.dtype).reshape(n, length, tv)
            else:
                # NOTE: emitting the logits in f32 straight from the dots
                # (preferred_element_type) was measured SLOWER — three f32
                # (n, l, m, h) tensors cost more HBM than bf16 sums + one
                # convert fused into the softmax.
                logits = (
                    jnp.einsum("nlhd,nmhd->nlmh", q_c, k)
                    + jnp.einsum("nlhd,lmd->nlmh", q_r, qr)
                    + jnp.einsum("nmhd,lmd->nlmh", k_r, kr)
                )
                weights = nn.softmax(logits.astype(jnp.float32), axis=2)
                weights = weights.astype(v.dtype)
                retrieved_content = jnp.einsum(
                    "nlmh,nmhd->nlhd", weights, v).reshape(n, length, tv)
                retrieved_rpe = jnp.einsum(
                    "nlmh,lmd->nlhd", weights, vr.astype(weights.dtype)
                ).reshape(n, length, tv)
            s2, b2 = _BNFoldParams(
                2 * tv, name="batch_norm_retrieved_output")()
            s2 = s2.astype(retrieved_content.dtype)
            out = (retrieved_content * s2[:tv] + retrieved_rpe * s2[tv:]
                   + (b2[:tv] + b2[tv:]).astype(retrieved_content.dtype))
            return out
        else:
            content_sim = jnp.einsum("nlhd,nmhd->nlmh", q, k)
            query_rpe_sim = jnp.einsum(
                "nlhd,lmd->nlmh", q, query_rpe.astype(q.dtype))
            key_rpe_sim = jnp.einsum(
                "nmhd,lmd->nlmh", k, key_rpe.astype(k.dtype))
            sim = jnp.concatenate(
                [content_sim, query_rpe_sim, key_rpe_sim], axis=-1)
            sim = BatchNorm(
                features=3 * h, dtype=self.dtype,
                name="batch_norm_similarity",
            )(sim, train=train)
            logits = sim.reshape(n, length, length, 3, h).sum(axis=3)
            weights = nn.softmax(logits.astype(jnp.float32), axis=2)
            weights = weights.astype(v.dtype)

            retrieved_content = jnp.einsum(
                "nlmh,nmhd->nlhd", weights, v).reshape(
                n, length, self.total_value_depth)
            retrieved_rpe = jnp.einsum(
                "nlmh,lmd->nlhd", weights, value_rpe.astype(weights.dtype)
            ).reshape(n, length, self.total_value_depth)

        retrieved = jnp.concatenate([retrieved_content, retrieved_rpe], axis=-1)
        retrieved = BatchNorm(
            features=2 * self.total_value_depth,
            dtype=self.dtype,
            name="batch_norm_retrieved_output",
        )(retrieved, train=train)
        out = retrieved.reshape(n, length, 2, self.total_value_depth).sum(axis=2)
        return out

    def _batch_minor_eval(self, x):
        """Eval path on (N, L, W, C): attention along L with the W batch
        dim carried IN PLACE by 5-D einsums — no transposes in or out.
        Declares the identical param/variable tree as the standard path."""
        n, length, w, _ = x.shape
        h = self.num_heads
        dk = self.total_key_depth // h
        dv = self.total_value_depth // h
        tk = self.total_key_depth
        tv = self.total_value_depth
        in_planes = x.shape[-1]

        qkv = ConvBN(
            tk * 2 + tv, kernel_size=1, use_bias=False, norm=None, act=None,
            conv_type="1d", conv_init_std=in_planes ** -0.5,
            dtype=self.dtype, name="qkv_transform",
        )(x, train=False)
        qkv = BatchNorm(
            features=qkv.shape[-1], dtype=self.dtype, name="batch_norm_qkv"
        )(qkv, train=False)

        q = qkv[..., :tk].reshape(n, length, w, h, dk)
        k = qkv[..., tk : 2 * tk].reshape(n, length, w, h, dk)
        v = qkv[..., 2 * tk :].reshape(n, length, w, h, dv)

        qr = RelativePositionalEncoding(length, length, dk, name="query_rpe")()
        kr = RelativePositionalEncoding(length, length, dk, name="key_rpe")()
        vr = RelativePositionalEncoding(length, length, dv, name="value_rpe")()

        s3, _ = _BNFoldParams(3 * h, name="batch_norm_similarity")()
        s3 = s3.astype(q.dtype)
        q_c = q * s3[0 * h : 1 * h, None]
        q_r = q * s3[1 * h : 2 * h, None]
        k_r = k * s3[2 * h : 3 * h, None]
        qr = qr.astype(q.dtype)
        kr = kr.astype(k.dtype)

        f32 = jnp.float32
        logits = (
            jnp.einsum("nlwhd,nmwhd->nwlmh", q_c, k,
                       preferred_element_type=f32)
            + jnp.einsum("nlwhd,lmd->nwlmh", q_r, qr,
                         preferred_element_type=f32)
            + jnp.einsum("nmwhd,lmd->nwlmh", k_r, kr,
                         preferred_element_type=f32)
        )
        weights = nn.softmax(logits, axis=3).astype(v.dtype)

        retrieved_content = jnp.einsum(
            "nwlmh,nmwhd->nlwhd", weights, v).reshape(n, length, w, tv)
        retrieved_rpe = jnp.einsum(
            "nwlmh,lmd->nlwhd", weights, vr.astype(weights.dtype)
        ).reshape(n, length, w, tv)
        s2, b2 = _BNFoldParams(2 * tv, name="batch_norm_retrieved_output")()
        s2 = s2.astype(retrieved_content.dtype)
        return (retrieved_content * s2[:tv] + retrieved_rpe * s2[tv:]
                + (b2[:tv] + b2[tv:]).astype(retrieved_content.dtype))


class AxialAttention2D(nn.Module):
    """Height-axis then width-axis axial attention on (N, H, W, C)."""

    query_shape: tuple  # (H, W)
    filters: int = 512
    key_expansion: float = 1.0
    value_expansion: float = 2.0
    num_heads: int = 8
    head_batched: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, height, width, c = x.shape
        total_key_depth = int(round(self.filters * self.key_expansion))
        total_value_depth = int(round(self.filters * self.value_expansion))

        if not train and os.environ.get("AXIALVS_AXIAL_BM", "0") == "1":
            # eval: height axis runs batch-minor on (N, H, W, C) directly
            # and the width axis is a free leading-dim merge — ZERO
            # transposes. MEASURED SLOWER on v5e (1.72 vs 1.41 ms/block,
            # tools/bench_axial.py): the 5-D einsums' internal dot layouts
            # cost more than the two explicit ~0.15 ms relayouts they
            # remove. Kept opt-in for other geometries.
            xh = AxialAttention(
                query_shape=self.query_shape[0],
                total_key_depth=total_key_depth,
                total_value_depth=total_value_depth,
                num_heads=self.num_heads,
                batch_minor=True,
                dtype=self.dtype,
                name="height_axis",
            )(x, train=False)  # (N, H, W, V)
            xw = AxialAttention(
                query_shape=self.query_shape[1],
                total_key_depth=total_key_depth,
                total_value_depth=total_value_depth,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name="width_axis",
            )(xh.reshape(n * height, width, total_value_depth), train=False)
            return xw.reshape(n, height, width, total_value_depth)

        # height axis: sequences of length H batched over (N, W)
        xh = x.transpose(0, 2, 1, 3).reshape(n * width, height, c)
        xh = AxialAttention(
            query_shape=self.query_shape[0],
            total_key_depth=total_key_depth,
            total_value_depth=total_value_depth,
            num_heads=self.num_heads,
            head_batched=self.head_batched,
            dtype=self.dtype,
            name="height_axis",
        )(xh, train=train)
        # (N*W, H, V) -> (N*H, W, V)
        xw = (
            xh.reshape(n, width, height, total_value_depth)
            .transpose(0, 2, 1, 3)
            .reshape(n * height, width, total_value_depth)
        )
        xw = AxialAttention(
            query_shape=self.query_shape[1],
            total_key_depth=total_key_depth,
            total_value_depth=total_value_depth,
            num_heads=self.num_heads,
            head_batched=self.head_batched,
            dtype=self.dtype,
            name="width_axis",
        )(xw, train=train)
        return xw.reshape(n, height, width, total_value_depth)

"""Fused axial-trajectory attention kernel (round 5).

Motivation (round-5 Tube-Link trace, docs/PERFORMANCE.md): the two-stage
trajectory attention (`layers/trajectory_attention.py`, re-designing the
reference's `temporal_attention.py:20-220`) lowers to ~25 small XLA ops
per call at tiny shapes (N = T*H tokens of 50-200, heads 8, d 32) — per
op the tensors are KBs, so each inter-fusion HBM round trip dominates.
Tube-Link runs 24 such calls per clip (6 encoder layers x 2 temporal
levels x 2 axes) and the kMaX WC module several more: together a
"~300-op tail with no item over 0.16 ms" that round 4's ceiling analysis
charged as the harvestable part of the Tube-Link gap.

This kernel fuses everything BETWEEN the q/k/v projections and the final
output projection into ONE Pallas program per call — stage-1 per-frame
spatial softmax + trajectory aggregation, the frame-diagonal extraction,
the stage-2 projections (their weights ride into VMEM), and the temporal
softmax — so the (N, f, C) trajectory tensor never touches HBM.

Grid: one program per batch row (B' = b*W or b*H in axial use). Per-head
/ per-frame work is statically unrolled (f, h are small constants);
per-frame key/value rows are SUBLANE slices (tokens are frame-major) and
per-head features are 32-lane static slices.

Differentiable: custom_vjp whose backward is the VJP of the identical
jnp math (``_traj_math``) over the (q, k, v, weights) residuals — the
same recipe as ``msda_pallas.weighted_corner_reduce_v4_ad``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _traj_math(q, k, v, wq2, bq2, wkv2, bkv2, num_frames: int,
               num_heads: int, scale: float):
    """Pure-jnp twin of the kernel — numerically the
    `layers.trajectory_attention.TrajectoryAttention` middle section
    (post q/k/v projection, pre output projection). Shapes:
    q/k/v (B, N, C), N = num_frames * n frame-major; returns (B, N, C).
    Used as the custom_vjp backward rule and as the parity oracle."""
    b, n_tokens, c = q.shape
    f = num_frames
    h = num_heads
    d = c // h
    n = n_tokens // f

    qh = q.reshape(b, n_tokens, h, d)
    kh = k.reshape(b, n_tokens, h, d)
    vh = v.reshape(b, n_tokens, h, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).reshape(
        b, h, n_tokens, f, n)
    attn = jax.nn.softmax(
        (scale * logits).astype(jnp.float32), axis=-1).astype(v.dtype)
    vf = vh.reshape(b, f, n, h, d)
    traj = jnp.einsum("bhqfn,bfnhd->bqfhd", attn, vf)
    x = traj.reshape(b, n_tokens, f, h * d)
    x5 = x.reshape(b, f, n, f, h * d)
    x_diag = jnp.diagonal(x5, axis1=1, axis2=3)  # (B, n, hd, F)
    x_diag = jnp.moveaxis(x_diag, -1, 1).reshape(b, n_tokens, h * d)

    q2 = (jnp.dot(x_diag, wq2.astype(x.dtype)).astype(x.dtype)
          + bq2.astype(x.dtype))
    kv2 = (jnp.dot(x, wkv2.astype(x.dtype)).astype(x.dtype)
           + bkv2.astype(x.dtype))
    k2, v2 = jnp.split(kv2, 2, axis=-1)
    q2 = q2.reshape(b, n_tokens, h, d) * scale
    k2 = k2.reshape(b, n_tokens, f, h, d)
    v2 = v2.reshape(b, n_tokens, f, h, d)
    t_logits = jnp.einsum("bshd,bsfhd->bshf", q2, k2)
    t_attn = jax.nn.softmax(
        t_logits.astype(jnp.float32), axis=-1).astype(v2.dtype)
    out = jnp.einsum("bshf,bsfhd->bshd", t_attn, v2)
    return out.reshape(b, n_tokens, c)


def _kernel(q_ref, k_ref, v_ref, wq2_ref, bq2_ref, wkv2_ref, bkv2_ref,
            out_ref, *, f: int, h: int, d: int, scale: float):
    q = q_ref[0]  # (N, C)
    k = k_ref[0]
    v = v_ref[0]
    n_tokens = q.shape[0]
    n = n_tokens // f
    dt = q.dtype

    # stage 1: per (frame, head) spatial softmax + trajectory aggregation
    x_frames = []  # f pieces of (N, C): x[:, g, :]
    for g in range(f):
        heads = []
        for hi in range(h):
            qh = q[:, hi * d:(hi + 1) * d]
            khg = k[g * n:(g + 1) * n, hi * d:(hi + 1) * d]
            vhg = v[g * n:(g + 1) * n, hi * d:(hi + 1) * d]
            logit = jax.lax.dot_general(
                qh, khg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (N, n)
            attn = jax.nn.softmax(scale * logit, axis=-1).astype(dt)
            heads.append(jax.lax.dot_general(
                attn, vhg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt))
        x_frames.append(jnp.concatenate(heads, axis=-1))  # (N, C)

    # frame-diagonal: token s of frame g keeps frame g's aggregation —
    # with frame-major tokens that's a per-frame SUBLANE block
    x_diag = jnp.concatenate(
        [x_frames[g][g * n:(g + 1) * n] for g in range(f)], axis=0)

    # stage 2 projections (weights live in VMEM; x never leaves the chip)
    q2 = (jnp.dot(x_diag, wq2_ref[...],
                  preferred_element_type=jnp.float32).astype(dt)
          + bq2_ref[...])
    kv2 = [
        (jnp.dot(x_frames[g], wkv2_ref[...],
                 preferred_element_type=jnp.float32).astype(dt)
         + bkv2_ref[...])
        for g in range(f)
    ]  # f x (N, 2C)

    # stage 2: temporal softmax along the trajectory, per head
    c = h * d
    outs = []
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q2h = (q2[:, sl] * scale).astype(jnp.float32)  # (N, d)
        tl = [
            jnp.sum(q2h * kv2[g][:, sl].astype(jnp.float32), axis=-1,
                    keepdims=True)
            for g in range(f)
        ]
        tl = jnp.concatenate(tl, axis=-1)  # (N, f) f32
        ta = jax.nn.softmax(tl, axis=-1)
        oh = sum(
            ta[:, g:g + 1]
            * kv2[g][:, c + hi * d: c + (hi + 1) * d].astype(jnp.float32)
            for g in range(f)
        )
        outs.append(oh.astype(dt))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_trajectory_attention(q, k, v, wq2, bq2, wkv2, bkv2,
                               num_frames: int, num_heads: int,
                               scale: float, interpret: bool = False):
    """One-kernel trajectory attention middle section.

    q/k/v: (B, N, C) post-projection, tokens frame-major (N = f*n).
    wq2/bq2, wkv2/bkv2: the stage-2 ``proj_q`` (C->C) / ``proj_kv``
    (C->2C) dense params, SAME dtype as q. Returns (B, N, C) — feed the
    caller's output projection. Matches ``_traj_math`` (and therefore
    the XLA TrajectoryAttention path) to accumulation-order tolerance.
    """
    b, n_tokens, c = q.shape
    d = c // num_heads
    kern = functools.partial(
        _kernel, f=num_frames, h=num_heads, d=d, scale=scale)
    row = pl.BlockSpec((1, n_tokens, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full2 = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[row, row, row, full2(wq2), full2(bq2[None]),
                  full2(wkv2), full2(bkv2[None])],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, n_tokens, c), q.dtype),
        interpret=interpret,
    )(q, k, v, wq2, bq2[None], wkv2, bkv2[None])


def _fta_fwd(q, k, v, wq2, bq2, wkv2, bkv2, num_frames, num_heads, scale,
             interpret):
    out = fused_trajectory_attention(
        q, k, v, wq2, bq2, wkv2, bkv2, num_frames, num_heads, scale,
        interpret)
    return out, (q, k, v, wq2, bq2, wkv2, bkv2)


def _fta_bwd(num_frames, num_heads, scale, interpret, res, ct):
    _, vjp = jax.vjp(
        lambda *a: _traj_math(*a, num_frames=num_frames,
                              num_heads=num_heads, scale=scale), *res)
    return vjp(ct)


fused_trajectory_attention.defvjp(_fta_fwd, _fta_bwd)

"""Pallas TPU kernel: fused 7x7 depthwise conv + LayerNorm (ConvNeXt block).

The ConvNeXt block opens with ``dwconv 7x7 -> LayerNorm(fp32)`` (reference
`kmax_deeplab/modeling/backbone/convnext.py:15-50`). Under XLA these are the
two non-MXU costs of the backbone: the depthwise conv lowers to a 49-tap
VPU shift-add at ~40% utilization, and the fp32 LayerNorm materializes two
dtype converts + reductions in HBM between the conv and pwconv1 (profiled
~10 ms dwconv + ~8 ms LN/converts per ConvNeXt-L clip at 769x1345).

This kernel computes both in one VMEM pass: the activation is read from HBM
once (bf16), the 49 taps accumulate in f32 in VMEM, LayerNorm normalizes the
accumulator in-register, and only the bf16 result returns to HBM.

Halo handling: the grid tiles H; each step reads its own row-block plus both
neighbor blocks (three BlockSpecs over the same array with shifted index
maps — Pallas pipelines these automatically, unlike manual element DMAs
which measured latency-bound). Out-of-image rows (top/bottom halo at the
edges, the tail of a non-dividing H) are zeroed by a global-row validity
select, which also neutralizes the garbage Pallas may feed for
out-of-bounds tail blocks.

Inference-only (no VJP); training keeps the differentiable XLA path, same
pattern as ops/msda_pallas.weighted_corner_reduce_v4.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
            out_ref, *, tile_h: int, height: int, eps: float):
    i = pl.program_id(1)
    th = tile_h
    # assemble rows [i*th - 3, i*th + th + 3) of the image
    top = xm1_ref[0, th - 3:th]          # (3, W, C)
    mid = x0_ref[0]                      # (th, W, C)
    bot = xp1_ref[0, 0:3]                # (3, W, C)
    col = jnp.concatenate([top, mid, bot], axis=0)  # (th+6, W, C)
    # zero out rows outside [0, H): clamped halo duplicates at the image
    # edges and the padded tail of a non-dividing H (select, not multiply —
    # out-of-bounds tail data is unspecified and may hold NaN bit patterns)
    g = (jax.lax.broadcasted_iota(jnp.int32, (th + 6, 1, 1), 0)
         + i * th - 3)
    col = jnp.where((g >= 0) & (g < height), col, jnp.zeros_like(col))
    w = col.shape[1]
    # keep the assembled column bf16 (an f32 copy would double the VMEM
    # stack footprint past the scoped limit at C=768+); taps upcast
    # per-slice in registers and accumulate f32
    colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))

    # dx outer: ONE sublane shift + f32 upcast per dx column (7 total);
    # the dy taps inside are plain row offsets (free addressing).
    # SEVEN INDEPENDENT per-dx accumulators tree-combined at the end — a
    # single 49-FMA serial chain is latency-bound on the VPU and measured
    # 1.65x slower (round-4 tools/exp_dwconv_variants.py: 1.89 -> 1.14 ms
    # at the stage-0 shape). The f32 sum reassociation moves the bf16
    # output by <= 2 ulp.
    parts = []
    for dx in range(7):
        sh = colp[:, dx:dx + w].astype(jnp.float32)
        p = sh[0:th] * kw_ref[dx]
        for dy in range(1, 7):
            p = p + sh[dy:dy + th] * kw_ref[dy * 7 + dx]
        parts.append(p)
    acc = kb_ref[0].astype(jnp.float32) + (
        ((parts[0] + parts[1]) + (parts[2] + parts[3]))
        + ((parts[4] + parts[5]) + parts[6]))
    # LayerNorm over channels, f32 (matches ops.norm.LayerNorm)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[0] + lb_ref[0]
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "eps"))
def dwconv7x7_layernorm(x, kernel, bias, ln_scale, ln_bias,
                        tile_h: int | None = None, eps: float = 1e-6):
    """x (N, H, W, C) bf16; kernel (7, 7, 1, C) (flax HWIO, depthwise);
    bias/ln_scale/ln_bias (C,) f32 -> (N, H, W, C) bf16 =
    LayerNorm(dwconv7x7_same(x) + bias) * ln_scale + ln_bias.

    tile_h None = auto (8): the round-4 sweep of the ILP kernel found
    tile 8 best-or-tied at every ConvNeXt-L stage shape (16 regressed
    stage2 0.40 -> 0.65 ms in the final sweep; >= 24 destabilized the
    tunnel worker and gained nothing)."""
    n, h, w, c = x.shape
    if tile_h is None:
        tile_h = 8
    nh = pl.cdiv(h, tile_h)
    kw = kernel.reshape(49, c).astype(jnp.float32)
    kb = bias.reshape(1, c).astype(jnp.float32)
    ls = ln_scale.reshape(1, c).astype(jnp.float32)
    lb = ln_bias.reshape(1, c).astype(jnp.float32)

    def row_spec(off):
        return pl.BlockSpec(
            (1, tile_h, w, c),
            lambda ni, hi: (ni, jnp.clip(hi + off, 0, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    param_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, height=h, eps=eps),
        grid=(n, nh),
        in_specs=[row_spec(-1), row_spec(0), row_spec(1),
                  param_spec, param_spec, param_spec, param_spec],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 49 * n * h * w * c + 8 * n * h * w * c,
            bytes_accessed=x.size * 2 * 4,  # 3x halo reads + 1 write, bf16
            transcendentals=0,
        ),
    )(x, x, x, kw, kb, ls, lb)


# ---------------------------------------------------------------------------
# Fused ConvNeXt MLP: pwconv1 -> GELU(tanh) -> pwconv2 -> *gamma -> +shortcut
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, sc_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                out_ref, *, hidden_chunk: int):
    x = x_ref[:]                                   # (R, C) bf16
    c = x.shape[-1]
    hidden = w1_ref.shape[-1]
    acc = jnp.broadcast_to(b2_ref[0], (x.shape[0], c))
    # chunk the hidden (4C) axis: GELU is pointwise, so each chunk's
    # gelu(x @ W1[:, s]) @ W2[s, :] contribution accumulates independently —
    # the (R, 4C) hidden activation never exists in full, neither in HBM
    # (XLA materializes it twice) nor in VMEM.
    for h0 in range(0, hidden, hidden_chunk):
        h1 = min(h0 + hidden_chunk, hidden)
        h = jnp.dot(x, w1_ref[:, h0:h1],
                    preferred_element_type=jnp.float32) + b1_ref[0, h0:h1]
        # tanh-form GELU (ops/act.py dtype-aware form; delta < 1 bf16 ulp)
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                      * (h + 0.044715 * h * h * h)))
        acc = acc + jnp.dot(h.astype(x.dtype), w2_ref[h0:h1, :],
                            preferred_element_type=jnp.float32)
    out_ref[:] = (sc_ref[:].astype(jnp.float32)
                  + g_ref[0] * acc).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "hidden_chunk"))
def convnext_mlp_residual(x, shortcut, w1, b1, w2, b2, gamma,
                          rows: int = 1024, hidden_chunk: int = 1024):
    """Fused ConvNeXt block tail (`convnext.py:15-50` pwconv1->gelu->pwconv2
    ->layer-scale->residual): ``shortcut + gamma * (gelu(x@w1+b1)@w2+b2)``.

    x/shortcut (..., C) bf16; w1 (C, 4C); w2 (4C, C); b1/b2/gamma f32.
    The hidden (4C) activation stays in VMEM, chunked along 4C — XLA's
    lowering writes + reads it in HBM (~50 MB per ConvNeXt-L stage-3 block
    at 769x1345). Inference-only (no VJP); weights ride as bf16 operands
    with f32 MXU accumulation.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    hidden = w1.shape[-1]
    xf = x.reshape(-1, c)
    scf = shortcut.reshape(-1, c)
    p = xf.shape[0]
    grid = (pl.cdiv(p, rows),)

    row_spec = pl.BlockSpec((rows, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel,
                          hidden_chunk=min(hidden_chunk, hidden)),
        grid=grid,
        in_specs=[row_spec, row_spec, full, full, full, full, full],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * p * c * hidden,
            bytes_accessed=(2 * p * c * 2 + 2 * c * hidden * 2 + p * c * 2),
            transcendentals=p * hidden,
        ),
    )(xf, scf, w1.astype(x.dtype), b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(x.dtype), b2.astype(jnp.float32).reshape(1, -1),
      gamma.astype(jnp.float32).reshape(1, -1))
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# Fully fused ConvNeXt block with cross-tile VPU/MXU software pipelining:
# dwconv7x7 + LayerNorm (VPU) for row-tile i runs in the same kernel step as
# pwconv1 -> GELU -> pwconv2 -> gamma + residual (MXU) for row-tile i-1, so
# the two units' independent work can dual-issue (measured ~28% overlap
# capacity on v5e, tools/bench_overlap.py) and the dw+LN intermediate never
# touches HBM at all.
# ---------------------------------------------------------------------------

def _block_kernel(xm1_ref, x0_ref, xp1_ref, xres_ref,
                  kw_ref, kb_ref, ls_ref, lb_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                  out_ref, dbuf,
                  *, tile_h: int, height: int, eps: float,
                  hidden_chunk: int, mlp_first: bool):
    i = pl.program_id(1)
    nh = pl.num_programs(1) - 1
    th = tile_h

    def mlp_phase():
        # dbuf rows are W-padded to wp (8-aligned): Mosaic cannot shape-cast
        # (th, W, C) <-> (th*W, C) vectors when W isn't sublane-aligned
        # ("infer-vector-layout: unsupported shape cast"), so the 2-D MXU
        # view is kept in the SCRATCH layout and rows move via aligned
        # slices; the wp-W garbage rows ride through the dots unread
        t = dbuf[(i - 1) % 2]                      # (th*wp, C) bf16
        rows, c = t.shape
        wp = rows // th
        w = out_ref.shape[2]
        hidden = w1_ref.shape[-1]
        acc = jnp.broadcast_to(b2_ref[0].astype(jnp.float32), (rows, c))
        for h0 in range(0, hidden, hidden_chunk):
            h1 = min(h0 + hidden_chunk, hidden)
            hh = jnp.dot(t, w1_ref[:, h0:h1],
                         preferred_element_type=jnp.float32) + b1_ref[0, h0:h1]
            hh = 0.5 * hh * (1.0 + jnp.tanh(
                0.7978845608028654 * (hh + 0.044715 * hh * hh * hh)))
            acc = acc + jnp.dot(hh.astype(t.dtype), w2_ref[h0:h1, :],
                                preferred_element_type=jnp.float32)
        for r in range(th):
            res_r = xres_ref[0, r].astype(jnp.float32)       # (W, C)
            out_ref[0, r] = (
                res_r + g_ref[0] * acc[r * wp:r * wp + w]
            ).astype(out_ref.dtype)

    def dw_phase():
        top = xm1_ref[0, th - 3:th]
        mid = x0_ref[0]
        bot = xp1_ref[0, 0:3]
        col = jnp.concatenate([top, mid, bot], axis=0)   # (th+6, W, C)
        g = (jax.lax.broadcasted_iota(jnp.int32, (th + 6, 1, 1), 0)
             + i * th - 3)
        col = jnp.where((g >= 0) & (g < height), col, jnp.zeros_like(col))
        w = col.shape[1]
        colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))
        # 7 independent per-dx accumulators (ILP; see _kernel above)
        parts = []
        for dx in range(7):
            sh = colp[:, dx:dx + w].astype(jnp.float32)
            p = sh[0:th] * kw_ref[dx]
            for dy in range(1, 7):
                p = p + sh[dy:dy + th] * kw_ref[dy * 7 + dx]
            parts.append(p)
        acc = kb_ref[0].astype(jnp.float32) + (
            ((parts[0] + parts[1]) + (parts[2] + parts[3]))
            + ((parts[4] + parts[5]) + parts[6]))
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
        y = (acc - mean) * jax.lax.rsqrt(var + eps)
        y = y * ls_ref[0] + lb_ref[0]
        wp = dbuf.shape[1] // th
        for r in range(th):
            dbuf[i % 2, r * wp:r * wp + w] = y[r].astype(dbuf.dtype)

    if mlp_first:
        @pl.when(i > 0)
        def _():
            mlp_phase()

        @pl.when(i < nh)
        def _():
            dw_phase()
    else:
        @pl.when(i < nh)
        def _():
            dw_phase()

        @pl.when(i > 0)
        def _():
            mlp_phase()


@functools.partial(jax.jit, static_argnames=(
    "tile_h", "eps", "hidden_chunk", "mlp_first"))
def convnext_block_fused(x, kernel, cbias, ln_scale, ln_bias,
                         w1, b1, w2, b2, gamma,
                         tile_h: int = 8, eps: float = 1e-6,
                         hidden_chunk: int = 1024, mlp_first: bool = True):
    """Whole ConvNeXt block (inference):
    ``x + gamma * pwconv2(gelu(pwconv1(LN(dwconv7x7(x) + cbias))))``
    in ONE Pallas kernel with the dw+LN (VPU) of row-tile i pipelined
    against the MLP (MXU) of row-tile i-1 through a double-buffered VMEM
    scratch. Grid runs nh+1 steps; step 0 only produces, step nh only
    consumes. Inference-only (no VJP)."""
    n, h, w, c = x.shape
    nh = pl.cdiv(h, tile_h)
    hidden = w1.shape[-1]
    kw = kernel.reshape(49, c).astype(jnp.float32)
    kb = cbias.reshape(1, c).astype(jnp.float32)
    ls = ln_scale.reshape(1, c).astype(jnp.float32)
    lb = ln_bias.reshape(1, c).astype(jnp.float32)

    def row_spec(off):
        return pl.BlockSpec(
            (1, tile_h, w, c),
            lambda ni, hi: (ni, jnp.clip(hi + off, 0, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    param = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _block_kernel, tile_h=tile_h, height=h, eps=eps,
            hidden_chunk=min(hidden_chunk, hidden), mlp_first=mlp_first),
        grid=(n, nh + 1),
        in_specs=[row_spec(-1), row_spec(0), row_spec(1), row_spec(-1),
                  param, param, param, param,
                  param, param, param, param, param],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c),
            lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        # rows W-padded to a sublane-aligned stride (see _block_kernel)
        scratch_shapes=[pltpu.VMEM((2, tile_h * (-(-w // 8) * 8), c),
                                   x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(2 * 49 + 4 * hidden // c * c) * n * h * w * c,
            bytes_accessed=x.size * 2 * 5 + 2 * c * hidden * 2,
            transcendentals=n * h * w * hidden,
        ),
    )(x, x, x, x, kw, kb, ls, lb,
      w1.astype(x.dtype), b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(x.dtype), b2.astype(jnp.float32).reshape(1, -1),
      gamma.astype(jnp.float32).reshape(1, -1))

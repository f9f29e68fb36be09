"""Experiment: dwconv7x7(+LN) Pallas kernel variants, measured on TPU.

Finds where the 10x-off-roofline time goes in ops/convnext_pallas.py's
dwconv kernel (round-4 north-star item): LN share, accumulation shape,
upcast strategy. Each variant is numerically checked against the shipped
kernel before timing.

Run: python tools/exp_dwconv_variants.py [--iters 30] [--stages stage0 ...]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from axial_vs_tpu.ops.convnext_pallas import dwconv7x7_layernorm

STAGES = {
    "stage0": (2, 193, 337, 192),
    "stage1": (2, 97, 169, 384),
    "stage2": (2, 49, 85, 768),
    "stage3": (2, 25, 43, 1536),
}


def _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height):
    top = xm1_ref[0, th - 3:th]
    mid = x0_ref[0]
    bot = xp1_ref[0, 0:3]
    col = jnp.concatenate([top, mid, bot], axis=0)  # (th+6, W, C)
    g = (jax.lax.broadcasted_iota(jnp.int32, (th + 6, 1, 1), 0) + i * th - 3)
    return jnp.where((g >= 0) & (g < height), col, jnp.zeros_like(col))


def _ln(acc, ls_ref, lb_ref, eps):
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
    return (acc - mean) * jax.lax.rsqrt(var + eps) * ls_ref[0] + lb_ref[0]


# --- v_noln: shipped accumulation, LN skipped (measures LN share) --------
def _k_noln(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
            out_ref, *, tile_h, height, eps):
    i = pl.program_id(1)
    th = tile_h
    col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
    w = col.shape[1]
    colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))
    acc = jnp.broadcast_to(kb_ref[0].astype(jnp.float32), (th, w, col.shape[2]))
    for dx in range(7):
        sh = colp[:, dx:dx + w].astype(jnp.float32)
        for dy in range(7):
            acc = acc + sh[dy:dy + th] * kw_ref[dy * 7 + dx]
    out_ref[0] = acc.astype(out_ref.dtype)


# --- v_tree: balanced-tree accumulation over 49 partials ------------------
def _k_tree(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
            out_ref, *, tile_h, height, eps):
    i = pl.program_id(1)
    th = tile_h
    col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
    w = col.shape[1]
    colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))
    parts = []
    for dx in range(7):
        sh = colp[:, dx:dx + w].astype(jnp.float32)
        for dy in range(7):
            parts.append(sh[dy:dy + th] * kw_ref[dy * 7 + dx])
    while len(parts) > 1:
        nxt = [parts[j] + parts[j + 1] for j in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    acc = parts[0] + kb_ref[0].astype(jnp.float32)
    out_ref[0] = _ln(acc, ls_ref, lb_ref, eps).astype(out_ref.dtype)


# --- v_bf16: multiply in bf16, accumulate f32 pairwise --------------------
def _k_bf16(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
            out_ref, *, tile_h, height, eps):
    i = pl.program_id(1)
    th = tile_h
    col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
    w = col.shape[1]
    colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))
    kwb = kw_ref[...]
    acc = jnp.broadcast_to(kb_ref[0].astype(jnp.float32), (th, w, col.shape[2]))
    for dx in range(7):
        sh = colp[:, dx:dx + w]  # stays bf16
        for dy in range(7):
            acc = acc + (sh[dy:dy + th] * kwb[dy * 7 + dx].astype(sh.dtype)
                         ).astype(jnp.float32)
    out_ref[0] = _ln(acc, ls_ref, lb_ref, eps).astype(out_ref.dtype)


# --- v_f32once: one padded f32 copy, taps slice it ------------------------
def _k_f32once(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
               out_ref, *, tile_h, height, eps):
    i = pl.program_id(1)
    th = tile_h
    col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
    w = col.shape[1]
    colf = jnp.pad(col.astype(jnp.float32), ((0, 0), (3, 3), (0, 0)))
    acc = jnp.broadcast_to(kb_ref[0].astype(jnp.float32), (th, w, col.shape[2]))
    for dx in range(7):
        for dy in range(7):
            acc = acc + colf[dy:dy + th, dx:dx + w] * kw_ref[dy * 7 + dx]
    out_ref[0] = _ln(acc, ls_ref, lb_ref, eps).astype(out_ref.dtype)


# --- v_dyn7: 7 dx-shifted copies but dy-partials summed per dx ------------
def _k_dxpart(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
              out_ref, *, tile_h, height, eps):
    i = pl.program_id(1)
    th = tile_h
    col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
    w = col.shape[1]
    colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))
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
    out_ref[0] = _ln(acc, ls_ref, lb_ref, eps).astype(out_ref.dtype)


# --- v_accN: N round-robin accumulators over the 49 taps ------------------
def _make_accn(n_acc):
    def _k(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
           out_ref, *, tile_h, height, eps):
        i = pl.program_id(1)
        th = tile_h
        col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
        w = col.shape[1]
        colp = jnp.pad(col, ((0, 0), (3, 3), (0, 0)))
        accs = [None] * n_acc
        t = 0
        for dx in range(7):
            sh = colp[:, dx:dx + w].astype(jnp.float32)
            for dy in range(7):
                p = sh[dy:dy + th] * kw_ref[dy * 7 + dx]
                k = t % n_acc
                accs[k] = p if accs[k] is None else accs[k] + p
                t += 1
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        acc = acc + kb_ref[0].astype(jnp.float32)
        out_ref[0] = _ln(acc, ls_ref, lb_ref, eps).astype(out_ref.dtype)
    return _k


# --- v_dxonce: dxpart ILP structure over ONE padded f32 upcast -------------
def _k_dxonce(xm1_ref, x0_ref, xp1_ref, kw_ref, kb_ref, ls_ref, lb_ref,
              out_ref, *, tile_h, height, eps):
    i = pl.program_id(1)
    th = tile_h
    col = _assemble(xm1_ref, x0_ref, xp1_ref, i, th, height)
    w = col.shape[1]
    colf = jnp.pad(col.astype(jnp.float32), ((0, 0), (3, 3), (0, 0)))
    parts = []
    for dx in range(7):
        p = colf[0:th, dx:dx + w] * kw_ref[dx]
        for dy in range(1, 7):
            p = p + colf[dy:dy + th, dx:dx + w] * kw_ref[dy * 7 + dx]
        parts.append(p)
    acc = kb_ref[0].astype(jnp.float32) + (
        ((parts[0] + parts[1]) + (parts[2] + parts[3]))
        + ((parts[4] + parts[5]) + parts[6]))
    out_ref[0] = _ln(acc, ls_ref, lb_ref, eps).astype(out_ref.dtype)


VARIANTS = {
    "noln": _k_noln,
    "tree": _k_tree,
    "bf16mul": _k_bf16,
    "f32once": _k_f32once,
    "dxpart": _k_dxpart,
    "acc2": _make_accn(2),
    "acc4": _make_accn(4),
    "dxonce": _k_dxonce,
}


@functools.partial(jax.jit, static_argnames=("variant", "tile_h", "eps"))
def run_variant(x, kernel, bias, ln_scale, ln_bias, variant,
                tile_h: int = 8, eps: float = 1e-6):
    if variant == "ship":
        return dwconv7x7_layernorm(x, kernel, bias, ln_scale, ln_bias,
                                   tile_h=tile_h, eps=eps)
    n, h, w, c = x.shape
    nh = pl.cdiv(h, tile_h)
    kw = kernel.reshape(49, c).astype(jnp.float32)
    kb = bias.reshape(1, c).astype(jnp.float32)
    ls = ln_scale.reshape(1, c).astype(jnp.float32)
    lb = ln_bias.reshape(1, c).astype(jnp.float32)

    def row_spec(off):
        return pl.BlockSpec(
            (1, tile_h, w, c),
            lambda ni, hi: (ni, jnp.clip(hi + off, 0, nh - 1), 0, 0),
            memory_space=pltpu.VMEM)

    param_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(VARIANTS[variant], tile_h=tile_h, height=h, eps=eps),
        grid=(n, nh),
        in_specs=[row_spec(-1), row_spec(0), row_spec(1),
                  param_spec, param_spec, param_spec, param_spec],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, kw, kb, ls, lb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--stages", nargs="*", default=["stage0", "stage2"])
    ap.add_argument("--variants", nargs="*",
                    default=["ship"] + list(VARIANTS))
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    for name in args.stages:
        n, h, w, c = STAGES[name]
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.randn(7, 7, 1, c) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        ls = jnp.ones((c,), jnp.float32)
        lb = jnp.zeros((c,), jnp.float32)
        ref = np.asarray(dwconv7x7_layernorm(x, k, b, ls, lb,
                                             tile_h=args.tile))

        for vname in args.variants:
            got = np.asarray(run_variant(x, k, b, ls, lb, vname,
                                         tile_h=args.tile))
            if vname != "noln":
                err = np.abs(got.astype(np.float32) - ref.astype(np.float32))
                # reassociated f32 sums round differently into bf16
                # (2 ulp at |y|~1 is 0.0156); bf16 multiplies a bit more
                ok = err.max() < (0.1 if vname == "bf16mul" else 0.05)
                tag = "OK " if ok else f"MISMATCH max={err.max():.4f} "
            else:
                tag = "--  "

            chain = 8  # amortize the ~1.4 ms/iter fori_loop meter overhead

            @jax.jit
            def loop(x, k, b, ls, lb, niter, vname=vname):
                def body(i, carry):
                    y = x + (carry * 1e-12).astype(x.dtype)
                    for _ in range(chain):
                        y = run_variant(y, k, b, ls, lb, vname,
                                        tile_h=args.tile)
                    return jnp.mean(y, dtype=jnp.float32)
                return jax.lax.fori_loop(0, niter, body, jnp.float32(0))

            float(loop(x, k, b, ls, lb, 1))
            t0 = time.perf_counter()
            float(loop(x, k, b, ls, lb, args.iters))
            dt = (time.perf_counter() - t0) / (args.iters * chain) * 1e3
            flops = 2 * 49 * n * h * w * c
            print(f"{name} ({n},{h},{w},{c}) {vname:8s}: {tag}{dt:6.3f} ms "
                  f"({flops/dt*1e-9:.2f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmarks for the ConvNeXt hot ops at north-star scale (v5e).

Motivated by the round-2 profile: stage2 pwconv2 dot_general runs ~3x
slower than pwconv1 at identical FLOPs (suspect: stacked-weight layout
under nn.scan), and dwconv7x7 conv_general_dilated totals ~12 ms/clip.

Run: python tools/bench_convnext_ops.py [--iters 20]
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

# stage2 of ConvNeXt-L at 769x1345 T=2: tokens (2, 49, 85), C=768
TOK = 2 * 49 * 85
C = 768
DEPTH = 27


def timeit(name, fn, *args, iters=20):
    @jax.jit
    def loop(n, *a):
        def body(i, carry):
            a0 = a[0] + carry.astype(a[0].dtype) * 1e-12
            return fn(a0, *a[1:]).astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(1, *args))
    t0 = time.perf_counter()
    float(loop(iters, *args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms")
    return dt


def scan_dot(x, w_stack):
    """pwconv2 as in nn.scan today: stacked (D, 4C, C), standard (in, out)."""
    def body(carry, w):
        y = jnp.dot(carry[0], w)
        return (carry[0], y), None
    (_, y), _ = jax.lax.scan(body, (x, None), w_stack)
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(TOK, 4 * C).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(
        rng.randn(DEPTH, 4 * C, C).astype(np.float32) * 0.01, jnp.bfloat16)
    wt = jnp.transpose(w, (0, 2, 1))  # (D, C, 4C) "torch Linear" layout

    # ---- pwconv2 under scan: standard vs transposed stacked weights -------
    # chain iterations through a scalar so nothing is DCE'd or reordered
    def scan_std(x, w):
        def body(s, wi):
            y = jnp.dot(x + s.astype(x.dtype), wi)
            return y.astype(jnp.float32).mean() * 1e-12, None
        s, _ = jax.lax.scan(body, jnp.float32(0), w)
        return s

    def scan_tr(x, wt):
        def body(s, wi):
            # contract x dim 1 with wi dim 1 — no relayout of the slice
            y = jax.lax.dot_general(
                x + s.astype(x.dtype), wi, (((1,), (1,)), ((), ())))
            return y.astype(jnp.float32).mean() * 1e-12, None
        s, _ = jax.lax.scan(body, jnp.float32(0), wt)
        return s

    def unrolled(x, w):
        s = jnp.float32(0)
        for i in range(DEPTH):
            y = jnp.dot(x + s.astype(x.dtype), w[i])
            s = y.astype(jnp.float32).mean() * 1e-12
        return s

    timeit("pwconv2 scan (D,4C,C) standard", scan_std, x, w,
           iters=args.iters)
    timeit("pwconv2 scan (D,C,4C) transposed", scan_tr, x, wt,
           iters=args.iters)
    timeit("pwconv2 unrolled 27x", unrolled, x, w, iters=args.iters)

    # ---- full stage2 block chain with activation ablations -----------------
    x4 = jnp.asarray(
        rng.randn(2, 49, 85, C).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(
        rng.randn(DEPTH, C, 4 * C).astype(np.float32) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(
        rng.randn(DEPTH, 4 * C, C).astype(np.float32) * 0.01, jnp.bfloat16)
    kdw = jnp.asarray(rng.randn(DEPTH, 7, 7, 1, C).astype(np.float32) * 0.01,
                      jnp.bfloat16)
    gamma = jnp.asarray(np.full((C,), 1e-6, np.float32))

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return ((xf - mu) / jnp.sqrt(var + 1e-6)).astype(x.dtype)

    def make_stage(act, use_dw=True, ln_f32=True):
        def stage(x, w1, w2, kdw):
            def body(h, ws):
                wi1, wi2, ki = ws
                y = h
                if use_dw:
                    y = jax.lax.conv_general_dilated(
                        y, ki, (1, 1), [(3, 3), (3, 3)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=C)
                y = ln(y) if ln_f32 else y
                y = jnp.dot(y, wi1)
                y = act(y)
                y = jnp.dot(y, wi2)
                y = y * gamma.astype(y.dtype)
                return h + y, None
            out, _ = jax.lax.scan(body, x, (w1, w2, kdw))
            return out
        return stage

    gelu_exact = lambda v: jax.nn.gelu(v, approximate=False)
    gelu_tanh = lambda v: jax.nn.gelu(v, approximate=True)
    relu = jax.nn.relu
    ident = lambda v: v

    timeit("stage2 block chain gelu-exact", make_stage(gelu_exact),
           x4, w1, w2, kdw, iters=args.iters)
    timeit("stage2 block chain gelu-tanh ", make_stage(gelu_tanh),
           x4, w1, w2, kdw, iters=args.iters)
    timeit("stage2 block chain relu      ", make_stage(relu),
           x4, w1, w2, kdw, iters=args.iters)
    timeit("stage2 block chain identity  ", make_stage(ident),
           x4, w1, w2, kdw, iters=args.iters)
    timeit("stage2 block chain no-dwconv ", make_stage(gelu_exact, use_dw=False),
           x4, w1, w2, kdw, iters=args.iters)
    timeit("stage2 block chain no-LN     ", make_stage(gelu_exact, ln_f32=False),
           x4, w1, w2, kdw, iters=args.iters)

    # ---- dwconv 7x7: conv_general_dilated vs 49 shifted-slice FMA ---------
    for sname, (H, W_, CC) in (
        ("stage0", (193, 337, 192)),
        ("stage1", (97, 169, 384)),
        ("stage2", (49, 85, 768)),
        ("stage3", (25, 43, 1536)),
    ):
        xs = jnp.asarray(
            rng.randn(2, H, W_, CC).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(7, 7, 1, CC).astype(np.float32), jnp.bfloat16)

        def dw_conv(xs, k, CC=CC):
            return jax.lax.conv_general_dilated(
                xs, k, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=CC)

        def dw_shift(xs, k, H=H, W_=W_):
            xp = jnp.pad(xs, ((0, 0), (3, 3), (3, 3), (0, 0)))
            y = jnp.zeros_like(xs)
            for dy in range(7):
                for dx in range(7):
                    y = y + xp[:, dy:dy + H, dx:dx + W_, :] * k[dy, dx, 0]
            return y

        d1 = jax.jit(dw_conv)(xs, k)
        d2 = jax.jit(dw_shift)(xs, k)
        err = np.max(np.abs(np.asarray(d1, np.float32)
                            - np.asarray(d2, np.float32)))
        print(f"dwconv {sname} shift max|diff| = {err}")
        timeit(f"dwconv7x7 conv_general ({sname})", dw_conv, xs, k,
               iters=args.iters)
        timeit(f"dwconv7x7 shift-FMA    ({sname})", dw_shift, xs, k,
               iters=args.iters)


if __name__ == "__main__":
    main()

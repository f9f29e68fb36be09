"""Pallas TPU kernel: MSDA sample-weighted reduction.

Fuses the corner-weight broadcast + multiply + sample/corner reduction of
``ops.msda.ms_deform_attn`` into one VMEM pass. XLA materializes the
128-lane-repeated weights (1 GB at VIPSeg scale) plus a relayout copy
(~12 ms/layer); this kernel expands the (S, 4) slot weights in-register and
reduces the gathered (S, 4*D) rows directly (~traffic-bound).

Contract: g (R, S, 4*D) gathered corner rows, w (R, S, 4) slot weights
(already including attention weights) -> out (R, D): for each row r,
``out[r, d] = sum_s sum_k g[r, s, k*D+d] * w[r, s, k]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(g_ref, w_ref, out_ref, *, d: int):
    g = g_ref[...]            # (BLK, S, 4*D)
    w = w_ref[...]            # (BLK, S, 4)
    acc = jnp.zeros((g.shape[0], d), jnp.float32)
    for k in range(4):
        acc = acc + jnp.sum(
            g[:, :, k * d : (k + 1) * d].astype(jnp.float32)
            * w[:, :, k : k + 1].astype(jnp.float32),
            axis=1,
        )
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def weighted_corner_reduce(g, w, block_rows: int = 128):
    """g (R, S, 4*D); w (R, S, 4) -> (R, D). R must divide by block_rows
    (caller pads)."""
    r, s, d4 = g.shape
    d = d4 // 4
    assert r % block_rows == 0, (r, block_rows)
    grid = (r // block_rows,)
    return pl.pallas_call(
        functools.partial(_kernel, d=d),
        out_shape=jax.ShapeDtypeStruct((r, d), g.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, s, d4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, s, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(g, w)


def weighted_corner_reduce_ref(g, w):
    """Pure-jnp reference for tests."""
    r, s, d4 = g.shape
    d = d4 // 4
    g = g.reshape(r, s, 4, d)
    return jnp.einsum("rskd,rsk->rd", g.astype(jnp.float32),
                      w.astype(jnp.float32)).astype(g.dtype)

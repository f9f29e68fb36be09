"""Linear assignment for Hungarian matching under jit.

The reference calls scipy ``linear_sum_assignment`` on host per sample
(`kmax_deeplab/modeling/matcher.py:91`). Here the default path is a
``jax.pure_callback`` to scipy — exact, off the device, static shapes —
which XLA overlaps with surrounding device work. A fully on-device
Jonker-Volgonant–style auction solver is provided for callback-free
execution (near-optimal; used when ``exact=False``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_BIG = 1e9


def _lsap_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    b, n, m = cost.shape
    out = np.full((b, m), -1, np.int64)
    for i in range(b):
        cols = np.flatnonzero(valid[i])
        if cols.size == 0:
            continue
        sub = cost[i][:, cols]
        row_ind, col_ind = linear_sum_assignment(sub)
        out[i, cols[col_ind]] = row_ind
    return out.astype(np.int32)


def hungarian_assign(cost, valid, exact: bool = True):
    """Assign each valid GT column one query row, minimizing total cost.

    Args:
      cost: (B, N, M) float32 — rows = queries, columns = GT slots.
      valid: (B, M) bool — which GT columns are real.
    Returns:
      (B, M) int32: query index assigned to each GT column (-1 if invalid).
    """
    b, n, m = cost.shape
    if exact:
        return jax.pure_callback(
            _lsap_host,
            jax.ShapeDtypeStruct((b, m), jnp.int32),
            cost.astype(jnp.float32),
            valid,
            vmap_method="sequential",
        )
    return _auction_assign(cost.astype(jnp.float32), valid)


def _auction_assign(cost, valid, num_iters: int | None = None, eps_scale: float = 1e-3):
    """On-device auction algorithm (forward auction on the GT side).

    Each valid column bids for its best row; conflicts resolved by price
    raises. With a small epsilon this converges to near-optimal assignments —
    adequate for loss matching where ties are rare.
    """
    b, n, m = cost.shape
    benefit = -jnp.where(valid[:, None, :], cost, _BIG)  # maximize
    num_iters = num_iters or 4 * m
    eps = eps_scale

    def body(state, _):
        prices, owner = state  # prices (B, N); owner (B, N) int32 = col or -1
        # each column's current row (owner inverse)
        owned = jnp.zeros((b, m), bool)
        col_of_row = owner
        has = col_of_row >= 0
        owned = jnp.zeros((b, m), bool).at[
            jnp.arange(b)[:, None], jnp.clip(col_of_row, 0)
        ].set(has)
        unassigned = valid & ~owned  # (B, M)

        value = benefit - prices[:, :, None]  # (B, N, M)
        best = jnp.argmax(value, axis=1)  # (B, M) best row per column
        best_val = jnp.max(value, axis=1)
        second_val = -jnp.sort(-value, axis=1)[:, 1, :] if n > 1 else best_val
        bid = best_val - second_val + eps  # (B, M)

        # highest bid per row wins (mask non-bidders)
        bid_masked = jnp.where(unassigned, bid, -jnp.inf)
        # scatter-max bids onto rows
        row_bid = jnp.full((b, n), -jnp.inf)
        row_bid = row_bid.at[jnp.arange(b)[:, None], best].max(bid_masked)
        winner_col = jnp.argmax(
            jnp.where(
                (best[:, None, :] == jnp.arange(n)[None, :, None])
                & unassigned[:, None, :],
                bid[:, None, :],
                -jnp.inf,
            ),
            axis=2,
        )  # (B, N)
        row_has_bid = jnp.isfinite(row_bid)
        prices = jnp.where(row_has_bid, prices + jnp.maximum(row_bid, 0.0), prices)
        # rows taken by new winners displace old owners
        owner = jnp.where(row_has_bid, winner_col, owner)
        return (prices, owner), None

    init = (jnp.zeros((b, n)), jnp.full((b, n), -1, jnp.int32))
    (prices, owner), _ = jax.lax.scan(body, init, None, length=num_iters)
    # invert: column -> row
    out = jnp.full((b, m), -1, jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    has = owner >= 0
    out = out.at[jnp.arange(b)[:, None], jnp.clip(owner, 0)].set(
        jnp.where(has, rows, -1)
    )
    return jnp.where(valid, out, -1)

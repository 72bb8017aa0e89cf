"""Tally accumulation: scatter-add of per-lane contributions into grids.

The reference accumulates tallies with scalar array writes one photon at a
time (e.g. fluxUp(xIndex, yIndex) += weight,
Integrators/monteCarloRadiativeTransfer.f95:513).  On TPU thousands of lanes
tally concurrently; two strategies are provided:

  * "scatter": XLA scatter-add (jnp .at[].add) — works for any grid size.
  * "onehot":  contribution matmul against a one-hot lane->cell matrix —
    rides the MXU and is faster for small grids (the I3RC benchmark domains),
    where serialized scatters dominate the step time.

``tally_add`` picks per call site based on the flat grid size.
"""

from __future__ import annotations

import jax.numpy as jnp

# Grids up to this many cells use the one-hot matmul path.
ONEHOT_MAX_CELLS = 4096


def tally_scatter(acc: jnp.ndarray, flat_idx, values) -> jnp.ndarray:
    """acc[flat_idx] += values via XLA scatter-add (acc is 1-D)."""
    return acc.at[flat_idx].add(values, mode="drop")


def tally_onehot(acc: jnp.ndarray, flat_idx, values) -> jnp.ndarray:
    """acc += one_hot(flat_idx).T @ values on the MXU (acc is 1-D).

    Masked lanes must carry value 0 (an in-range index with zero value is
    harmless, unlike scatter's mode="drop" which needs no masking).
    """
    from i3rc_tpu.ops.gather import DOT_PRECISION

    n_cells = acc.shape[0]
    onehot = (flat_idx[:, None] == jnp.arange(n_cells, dtype=flat_idx.dtype)[None, :])
    return acc + jnp.matmul(values[None, :], onehot.astype(values.dtype),
                            preferred_element_type=jnp.float32,
                            precision=DOT_PRECISION)[0]


def tally_multi(acc: jnp.ndarray, flat_idx, values) -> jnp.ndarray:
    """acc (C, k) += one_hot(flat_idx).T @ values for values (L, k).

    One fused one-hot transpose-matmul accumulates k different tallies keyed
    by the same per-lane cell index.  Masked lanes must carry zero values.
    For wide accumulators the index is factorized (idx = hi*K + lo) so the
    one-hot generation stays narrow (see ops/gather.factored_read); exact
    because every output sums lanes whose contribution is value-or-zero.
    """
    from i3rc_tpu.ops.gather import DOT_PRECISION, FACTOR_MIN_ROWS, _factor_k

    c, m = acc.shape
    if c <= FACTOR_MIN_ROWS:
        onehot = (flat_idx[:, None] == jnp.arange(c, dtype=flat_idx.dtype)[None, :])
        return acc + jnp.matmul(onehot.astype(values.dtype).T, values,
                                preferred_element_type=jnp.float32,
                                precision=DOT_PRECISION)
    k = _factor_k(c, m)
    n_hi = -(-c // k)
    hi = flat_idx // k
    lo = flat_idx - hi * k
    oh_lo = (lo[:, None] == jnp.arange(k, dtype=flat_idx.dtype)[None, :]).astype(values.dtype)
    # W[l, lo, j] = oh_lo * value; tally[hi, lo, j] = oh_hi.T @ W  (MXU)
    # (An unrolled per-j variant — m separate (n_hi, L) x (L, k) matmuls —
    # was measured 40% SLOWER on the Landsat loop: the tall-skinny shapes
    # with 128-wide outputs waste the MXU; the fused (L, k*m) operand pays
    # a materialized copy but keeps one well-shaped matmul.)
    w = (oh_lo[:, :, None] * values[:, None, :]).reshape(values.shape[0], k * m)
    oh_hi = (hi[:, None] == jnp.arange(n_hi, dtype=flat_idx.dtype)[None, :]).astype(values.dtype)
    t = jnp.matmul(oh_hi.T, w, preferred_element_type=jnp.float32,
                   precision=DOT_PRECISION)
    t = t.reshape(n_hi * k, m)[:c]
    return acc + t


def tally_add(acc: jnp.ndarray, flat_idx, values, mask=None) -> jnp.ndarray:
    """Accumulate values into a 1-D tally; lanes with mask False contribute 0.

    The one-hot path materializes an (n_lanes, n_cells) matrix, so it is only
    chosen when that intermediate stays small; otherwise XLA scatter-add.
    """
    if mask is not None:
        values = jnp.where(mask, values, 0.0)
    if values.ndim == 1 and acc.shape[0] * values.shape[0] <= (1 << 22):
        return tally_onehot(acc, flat_idx, values)
    if mask is not None:
        flat_idx = jnp.where(mask, flat_idx, acc.shape[0])  # dropped by mode="drop"
    return tally_scatter(acc, flat_idx, values)

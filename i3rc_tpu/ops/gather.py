"""Gather strategies for per-lane random access on TPU.

Measured on TPU v5e (this repo's bench environment): a data-dependent gather
inside a compiled loop serializes at ~8 ns/element (~8 ms for 2^20 lanes),
while a one-hot matmul whose one-hot operand XLA fuses into the MXU feed
costs ~1.4 ms for 2^20 lanes x 1024 table rows — and fetches every table
column in the same op.  The transport kernel therefore reads ALL per-cell
quantities (extinction, cumulative fractions, albedos, phase indices) with a
single fused one-hot matmul per event, and falls back to serialized gathers
only when the table is too wide for the one-hot to win.

The same trick transposed implements tallies (see ops/tally.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this many table rows even the factorized one-hot (~sqrt scaling)
# loses to the serialized gather (measured ~8 ns/lane on v5e).
ONEHOT_MAX_ROWS = 262144

# TPU matmuls at DEFAULT precision round f32 operands to bfloat16 — measured
# 2^-9 relative error, enough to corrupt integer payloads above 256 (phase
# indices) and to bias the step-cloud flux by 8e-4.  "high" (multi-pass
# bf16) reads values to 1.4e-5 relative and integers below 2^16 exactly —
# far inside every other approximation in the pipeline (cubic inverse-CDF
# 3e-7, float32 position accumulation) — and costs ~3% end-to-end vs the
# biased default; "highest" is bit-exact at ~11%.  Payload ranges here
# (extinctions, albedos, cubic coefficients, phase indices < 2^16) make
# "high" safe; flip to "highest" to make every read bit-exact.
DOT_PRECISION = "high"


def onehot_read(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rows (L,) gathered from table (R, m) -> (L, m) via fused one-hot matmul.

    Each output sums exactly one table value (single-nonzero one-hot), read
    at DOT_PRECISION (see note above; bit-exact under "highest").
    """
    r = table.shape[0]
    iota = jnp.arange(r, dtype=idx.dtype)
    onehot = (idx[:, None] == iota[None, :]).astype(table.dtype)
    return jnp.matmul(onehot, table, preferred_element_type=jnp.float32,
                      precision=DOT_PRECISION)


# Row split for the factorized read/tally; rows padded to a multiple of this.
FACTOR_K = 32
# Below this many rows a single one-hot is cheaper than two narrow ones.
FACTOR_MIN_ROWS = 128


def _factor_k(r: int, m: int) -> int:
    """Near-optimal split: minimize K + (R/K)(m+1) over powers of two."""
    import math

    target = math.sqrt(max(r * (m + 1), 1))
    k = 32
    while k * 2 <= target and k < 2048:
        k *= 2
    return k


def factored_read(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows via idx = hi*K + lo factorization: two narrow one-hots.

    VPU cost drops from L*R compares to ~L*(K + (R/K)*(m+1)): the wide
    one-hot generation — the dominant per-event cost on TPU — is replaced by
    an MXU matmul whose operand is a K-wide one-hot.  Like onehot_read,
    every reduction has exactly one nonzero term and runs at DOT_PRECISION.
    K adapts to the table shape, so even ~100k-row tables (radar-cloud
    domains) stay vectorized.
    """
    r, m = table.shape
    k = _factor_k(r, m)
    n_hi = -(-r // k)
    if n_hi * k != r:
        table = jnp.pad(table, ((0, n_hi * k - r), (0, 0)))
    hi = idx // k
    lo = idx - hi * k
    oh_lo = (lo[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :]).astype(table.dtype)
    # M[l, hi, j] = sum_lo oh_lo[l, lo] * table[hi*K + lo, j]   (MXU)
    t3 = table.reshape(n_hi, k, m)
    mm = jnp.matmul(oh_lo, t3.transpose(1, 0, 2).reshape(k, n_hi * m),
                    preferred_element_type=jnp.float32,
                    precision=DOT_PRECISION).reshape(-1, n_hi, m)
    oh_hi = (hi[:, None] == jnp.arange(n_hi, dtype=idx.dtype)[None, :]).astype(table.dtype)
    return jnp.sum(mm * oh_hi[:, :, None], axis=1)


def serial_read(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Plain XLA gather; preferable for very wide tables."""
    return table[idx]


def read_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Strategy dispatch on the table height."""
    if table.shape[0] <= FACTOR_MIN_ROWS:
        return onehot_read(table, idx)
    if table.shape[0] <= ONEHOT_MAX_ROWS:
        return factored_read(table, idx)
    return serial_read(table, idx)

"""Exactness invariants of the one-hot gather/tally ops.

On TPU, matmuls at DEFAULT precision round f32 operands to bfloat16 (2^-9
relative), which corrupts integer payloads above 256 and biases transported
fluxes; the ops pin precision (ops/gather.DOT_PRECISION) to prevent this.
On CPU these pass trivially (f32 everywhere) — the value of the test is as a
regression guard when the suite runs on an accelerator.
"""

import jax
import jax.numpy as jnp
import numpy as np

from i3rc_tpu.ops.gather import factored_read, onehot_read, read_rows
from i3rc_tpu.ops.tally import tally_add, tally_multi, tally_onehot

RNG = np.random.default_rng(7)


def test_reads_reproduce_float_payloads():
    table = np.asarray(RNG.random((1024, 4)), np.float32)
    idx = np.asarray(RNG.integers(0, 1024, 4096), np.int32)
    ref = table[idx]
    for fn in (factored_read, read_rows):
        got = np.asarray(jax.jit(fn)(jnp.asarray(table), jnp.asarray(idx)))
        # DOT_PRECISION="high" guarantees 2e-5 relative; "highest" bit-exact.
        np.testing.assert_allclose(got, ref, rtol=2e-5)
    got = np.asarray(jax.jit(onehot_read)(jnp.asarray(table[:128]),
                                          jnp.asarray(idx % 128)))
    np.testing.assert_allclose(got, table[:128][idx % 128], rtol=2e-5)


def test_reads_reproduce_integer_payloads_exactly():
    """Phase-table indices ride as floats; they must survive bit-exactly."""
    table = np.arange(4096, dtype=np.float32)[:, None]
    idx = np.asarray(RNG.integers(0, 4096, 8192), np.int32)
    got = np.asarray(jax.jit(read_rows)(jnp.asarray(table), jnp.asarray(idx)))
    assert np.array_equal(got[:, 0].astype(np.int64), idx.astype(np.int64))


def test_tallies_match_float64_accumulation():
    idx = np.asarray(RNG.integers(0, 1024, 8192), np.int32)
    vals = np.asarray(RNG.random((8192, 3)), np.float32)
    ref = np.zeros((1024, 3))
    np.add.at(ref, idx, vals.astype(np.float64))
    got = np.asarray(jax.jit(tally_multi)(jnp.zeros((1024, 3), jnp.float32),
                                          jnp.asarray(idx), jnp.asarray(vals)))
    np.testing.assert_allclose(got, ref, rtol=3e-5)
    # narrow (<= FACTOR_MIN_ROWS) and 1-D paths
    got_n = np.asarray(jax.jit(tally_multi)(jnp.zeros((64, 3), jnp.float32),
                                            jnp.asarray(idx % 64), jnp.asarray(vals)))
    ref_n = np.zeros((64, 3))
    np.add.at(ref_n, idx % 64, vals.astype(np.float64))
    np.testing.assert_allclose(got_n, ref_n, rtol=3e-5)
    got_1 = np.asarray(jax.jit(tally_onehot)(jnp.zeros(64, jnp.float32),
                                             jnp.asarray(idx % 64),
                                             jnp.asarray(vals[:, 0])))
    np.testing.assert_allclose(got_1, ref_n[:, 0], rtol=3e-5)


def test_tally_add_mask_drops_lanes():
    idx = np.asarray(RNG.integers(0, 32, 512), np.int32)
    vals = np.ones(512, np.float32)
    mask = np.asarray(RNG.random(512) < 0.5)
    got = np.asarray(jax.jit(tally_add)(jnp.zeros(32, jnp.float32),
                                        jnp.asarray(idx), jnp.asarray(vals),
                                        jnp.asarray(mask)))
    ref = np.zeros(32)
    np.add.at(ref, idx[mask], 1.0)
    np.testing.assert_allclose(got, ref, rtol=1e-6)

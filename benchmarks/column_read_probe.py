"""Micro-benchmark: column-table read strategies for the Landsat fastpath.

The column fastpath's per-event cost is dominated by the (n_cols, 3-5)
table read (one row per lane per event; n_cols = 16384 for Landsat).
This probe measures, on the real TPU:

  1. the XLA factored one-hot read at several hi/lo splits (is the
     default _factor_k split optimal for this shape?);
  2. a minimal Pallas event loop whose K-event block holds the table in
     VMEM and reads it with two chained 128-wide one-hot contractions
     (the candidate design for a column-mode Pallas kernel) — measured
     in ns per lane-event, directly comparable to the ~70 ps/lane-event
     of the separable-medium Pallas kernel (PERF_NOTES.md).

Run on the TPU: python benchmarks/column_read_probe.py
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


L = 1 << 17
N_HI = 128   # ix
N_LO = 128   # iy
N_COLS = N_HI * N_LO
M = 4        # v, zb, zt, (ssa)
LOOP = 16


def xla_factored(table, idx, k):
    """ops/gather.factored_read with an explicit split k."""
    from i3rc_tpu.ops.gather import DOT_PRECISION
    r, m = table.shape
    n_hi = -(-r // k)
    hi = idx // k
    lo = idx - hi * k
    oh_lo = (lo[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :]).astype(table.dtype)
    t3 = table.reshape(n_hi, k, m)
    mm = jnp.matmul(oh_lo, t3.transpose(1, 0, 2).reshape(k, n_hi * m),
                    preferred_element_type=jnp.float32,
                    precision=DOT_PRECISION).reshape(-1, n_hi, m)
    oh_hi = (hi[:, None] == jnp.arange(n_hi, dtype=idx.dtype)[None, :]).astype(table.dtype)
    return jnp.sum(mm * oh_hi[:, :, None], axis=1)


def xla_loop(op, table):
    @jax.jit
    def f(idx):
        def body(c, _):
            s, ix = c
            r = op(table, ix)
            s = s + r[:, 0]
            ix = (ix + 1 + (r[:, 0].astype(jnp.int32) & 7)) % N_COLS
            return (s, ix), None
        (s, _), _ = jax.lax.scan(body, (jnp.zeros(L), idx), None, length=LOOP)
        return s
    return f


# ---------------------------------------------------------------------------
# Pallas candidate: K-event loop, per event one 2-digit one-hot table read
# plus a light elementwise "event" (~40 ops) to keep the loop honest.
# ---------------------------------------------------------------------------

def pallas_column_loop(blk, k_events, precision, split_fields):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // 128
    n_grid = R // blk
    prec = {"default": None, "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}[precision]

    def kernel(seed_ref, tab_ref, x_ref, y_ref, xo_ref, yo_ref, acc_ref):
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] + pl.program_id(0))
        tab = tab_ref[:]          # (128, 4*128) field-major [c*128 + iy]
        x = x_ref[...]
        y = y_ref[...]
        acc = jnp.zeros((blk, 128), jnp.float32)

        def uniform():
            bits = pltpu.bitcast(pltpu.prng_random_bits((blk, 128)), jnp.uint32)
            mant = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
            return pltpu.bitcast(mant, jnp.float32) - jnp.float32(1.0)

        for _ in range(k_events):
            ix = jnp.clip((x * 128.0).astype(jnp.int32), 0, 127)
            iy = jnp.clip((y * 128.0).astype(jnp.int32), 0, 127)
            j3 = jax.lax.broadcasted_iota(jnp.int32, (blk, 128, 128), 2)
            ohx = (ix[:, :, None] == j3).astype(jnp.float32)
            ohy = (iy[:, :, None] == j3).astype(jnp.float32)
            fields = []
            if split_fields:
                for c in range(M):
                    h = jax.lax.dot_general(
                        ohx, tab[:, c * 128:(c + 1) * 128],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    fields.append(jnp.sum(h * ohy, axis=2))
            else:
                h = jax.lax.dot_general(
                    ohx, tab, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                for c in range(M):
                    fields.append(jnp.sum(h[:, :, c * 128:(c + 1) * 128] * ohy,
                                          axis=2))
            v, zb, zt, ss = fields
            # light "event": advance, wrap, redraw
            u = uniform()
            x = x + (v - zb * 0.001 + zt * 0.001 + ss * 0.0) * 0.01 + u * 0.001
            x = x - jnp.floor(x)
            y = y + u * 0.002 + v * 0.005
            y = y - jnp.floor(y)
            acc = acc + v
        xo_ref[...] = x
        yo_ref[...] = y
        acc_ref[...] = acc

    spec = pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((N_HI, M * N_LO), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), tspec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * 3,
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def f(seed2, tab, x, y):
        acc = jnp.zeros((R, 128), jnp.float32)
        for _ in range(LOOP // k_events):
            x, y, acc = call(seed2, tab, x, y)
        return acc

    return f


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (N_COLS, M), dtype=jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (L,), 0, N_COLS,
                             dtype=jnp.int32)

    if "--pallas-only" not in sys.argv:
        from i3rc_tpu.ops.gather import factored_read
        t = timeit(xla_loop(factored_read, table), idx) / LOOP
        print(f"XLA factored_read default split:     {t*1e6:8.1f} us/op "
              f"({t/L*1e9:5.2f} ns/lane)", flush=True)
        for k in (1024, 2048):
            t = timeit(xla_loop(functools.partial(
                lambda tab, ix, kk: xla_factored(tab, ix, kk), kk=k), table),
                idx) / LOOP
            print(f"XLA factored k={k:5d}:                {t*1e6:8.1f} us/op "
                  f"({t/L*1e9:5.2f} ns/lane)", flush=True)

    # field-major pallas table: [c*128 + iy] columns, row = ix
    tab_pallas = jnp.asarray(
        np.transpose(np.asarray(table).reshape(N_HI, N_LO, M), (0, 2, 1))
        .reshape(N_HI, M * N_LO))
    R = L // 128
    x = jax.random.uniform(key, (R, 128), dtype=jnp.float32)
    y = jax.random.uniform(jax.random.fold_in(key, 2), (R, 128),
                           dtype=jnp.float32)
    seed2 = jnp.zeros((1, 2), jnp.int32)
    for blk in (32,):
        for prec in ("default", "highest"):
            for split in (True,):
                for ke in (8,):
                    try:
                        f = pallas_column_loop(blk, ke, prec, split)
                        t = timeit(f, seed2, tab_pallas, x, y) / LOOP
                        print(f"Pallas blk={blk:3d} K={ke} {prec:8s} "
                              f"split={int(split)}: {t*1e6:8.1f} us/event "
                              f"({t/L*1e9:5.2f} ns/lane-event)", flush=True)
                    except Exception as e:
                        print(f"Pallas blk={blk} K={ke} {prec} split={int(split)}"
                              f" FAILED: {type(e).__name__}: {str(e)[:200]}",
                              flush=True)


if __name__ == "__main__":
    main()

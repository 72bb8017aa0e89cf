"""Micro-benchmark: per-lane random-access strategies for BIG tables on TPU.

Decides the large-domain (>262k cells) general-kernel read design:
  * serial: plain XLA gather (the current fallback, ~8 ns/element measured
    round 1)
  * sorted-serial: argsort by index first (does XLA's gather emitter care?)
  * argsort alone (cost of the sort primitive at wavefront widths)
  * two-level "layer-sliced" read: sort by z-layer, then per-layer factored
    one-hot (feasibility probe for a Pallas scalar-prefetch kernel)

Run on the TPU: python benchmarks/gather_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    L = 1 << 17
    R = 128 * 128 * 119        # Landsat cell count
    m = 8
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (R, m), dtype=jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (L,), 0, R,
                             dtype=jnp.int32)

    # A loop wrapper so dispatch overhead doesn't mask the per-op cost: runs
    # the op 8 times with data dependence.
    def loop(op):
        @jax.jit
        def f(idx):
            def body(c, _):
                s, ix = c
                r = op(ix)
                s = s + r[:, 0]
                ix = (ix + r[:, 0].astype(jnp.int32) % 7 + 1) % R
                return (s, ix), None
            (s, _), _ = jax.lax.scan(body, (jnp.zeros(L), idx), None, length=8)
            return s
        return f

    serial = loop(lambda ix: table[ix])
    t = timeit(serial, idx) / 8
    print(f"serial gather (L=2^17, R=1.95M, m=8): {t*1e6:8.1f} us/op "
          f"({t/L*1e9:.2f} ns/lane)", flush=True)

    srt = loop(lambda ix: table[jnp.sort(ix)])
    t2 = timeit(srt, idx) / 8
    print(f"sorted gather (sort + gather):        {t2*1e6:8.1f} us/op", flush=True)

    @jax.jit
    def just_sort(ix):
        def body(c, _):
            return jnp.sort(c) + 1, None
        s, _ = jax.lax.scan(body, ix, None, length=8)
        return s
    t3 = timeit(just_sort, idx) / 8
    print(f"jnp.sort alone (int32, 2^17):          {t3*1e6:8.1f} us/op", flush=True)

    @jax.jit
    def argsort_op(ix):
        def body(c, _):
            p = jnp.argsort(c)
            return c[p] + 1, None
        s, _ = jax.lax.scan(body, ix, None, length=8)
        return s
    t4 = timeit(argsort_op, idx) / 8
    print(f"argsort + apply-perm (gather!):        {t4*1e6:8.1f} us/op", flush=True)

    # int8 gather: does element width change the serial gather cost?
    table8 = (table[:, 0] * 127).astype(jnp.int8)
    ser8 = loop(lambda ix: (table8[ix].astype(jnp.float32))[:, None] *
                jnp.ones((1, 1)))
    t5 = timeit(ser8, idx) / 8
    print(f"serial gather int8 single column:      {t5*1e6:8.1f} us/op", flush=True)

    # Narrow-table factored one-hot reference point (16k rows, column table).
    from i3rc_tpu.ops.gather import factored_read
    ctable = jax.random.uniform(key, (16384, 4), dtype=jnp.float32)
    cidx = jax.random.randint(jax.random.fold_in(key, 2), (L,), 0, 16384,
                              dtype=jnp.int32)
    fac = loop(lambda ix: factored_read(ctable, ix % 16384))
    t6 = timeit(fac, cidx) / 8
    print(f"factored one-hot 16k rows x 4:          {t6*1e6:8.1f} us/op", flush=True)


if __name__ == "__main__":
    main()

"""Quick TPU sweep of the fastpath collision-chaining depth.

Usage: python benchmarks/chain_sweep.py [N_LOG2] [chain:march:K specs...]
Measures the headline step-cloud flux config at 2^N photons for each
fastpath (chain, march, unroll-K) spec and prints photons/s.
"""

import sys
import time

import jax

sys.path.insert(0, ".")


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    specs = sys.argv[2:] or ["0", "1", "2", "3"]
    n_photons = 1 << n_log2

    from __graft_entry__ import _step_cloud_integrator
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    src = PhotonSource.directional(0.5, 0.0)
    key = jax.random.key(0, impl="rbg")
    for spec in specs:
        parts = [int(v) for v in spec.split(":")]
        chain = parts[0]
        march = parts[1] if len(parts) > 1 else 1
        # NB: unroll 0 now means AUTO (8; 32 for column media) — pass 1 for
        # a literal single-event block (config.fastpath_unroll docstring).
        unroll = parts[2] if len(parts) > 2 else 8
        lanes = 1 << (parts[3] if len(parts) > 3 else 18)
        integ = _step_cloud_integrator(
            config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                    compute_volume_absorption=False,
                                    fastpath_chain=chain,
                                    fastpath_march=march,
                                    fastpath_unroll=unroll))
        fn = integ.batch_fn(src, n_photons, n_lanes=min(lanes, n_photons))
        t0 = time.perf_counter()
        res = fn(jax.random.fold_in(key, 100))
        jax.block_until_ready(res.flux_up)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = fn(jax.random.fold_in(key, i))
            jax.block_until_ready(res.flux_up)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        rate = n_photons / dt
        print(f"chain={chain} march={march} K={unroll}: {rate/1e6:8.1f} M"
              f" photons/s  dt={dt*1e3:7.1f} ms  compile={compile_s:5.1f}s"
              f"  Fup={float(res.mean_flux_up):.5f}"
              f"  n_bad={int(res.n_bad)}", flush=True)


if __name__ == "__main__":
    main()

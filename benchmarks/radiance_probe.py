"""TPU probe: general-kernel radiance throughput (queued local estimation).

Measures the VERDICT round-2 #3 done-criterion config — step cloud + 3
detectors with use_hybrid_phase_funs=True on the GENERAL kernel (round-2
baseline ~3e5 photons/s) — plus the plain estimator, across
intensity_ray_steps values.

Usage: python benchmarks/radiance_probe.py [ray_steps...]
"""

import sys
import time

import jax

sys.path.insert(0, ".")


def main():
    steps_list = [int(v) for v in sys.argv[1:]] or [6]

    from __graft_entry__ import _step_cloud_integrator
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    src = PhotonSource.directional(0.5, 0.0)
    key = jax.random.key(5, impl="rbg")
    n = 1 << 19
    for hybrid in (True, False):
        for rs in steps_list:
            cfg = IntegratorConfig(
                use_ray_tracing=False, max_events=500,
                compute_volume_absorption=False, use_fastpath=False,
                majorant_block_size=16, use_hybrid_phase_funs=hybrid,
                intensity_ray_steps=rs)
            integ = _step_cloud_integrator(config=cfg).with_params(
                intensity_mus=[1.0, 0.5, 0.5], intensity_phis=[0.0, 0.0, 180.0])
            fn = integ.batch_fn(src, n, n_lanes=1 << 16)
            res = fn(jax.random.fold_in(key, 99))
            jax.block_until_ready(res.intensity)
            times = []
            for i in range(2):
                t0 = time.perf_counter()
                res = fn(jax.random.fold_in(key, i))
                jax.block_until_ready(res.intensity)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            import numpy as np
            print(f"hybrid={hybrid} ray_steps={rs}: {n/dt/1e6:7.2f} M photons/s"
                  f"  I={[round(float(v),4) for v in np.asarray(res.mean_intensity)]}"
                  f"  n_bad={int(res.n_bad)}", flush=True)


if __name__ == "__main__":
    main()
# (Extended sweep values are passed on the command line.)

"""Fastpath perf sweep: lanes x unroll on the step-cloud flux benchmark."""
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _step_cloud_integrator
from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.integrators.config import IntegratorConfig

N = 1 << 24
key = jax.random.key(0, impl="rbg")
source = PhotonSource.directional(0.5, 0.0)

for lanes_log in (16, 17, 18, 19):
    for unroll in (4, 8, 16, 32):
        integ = _step_cloud_integrator(
            config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                    compute_volume_absorption=False,
                                    majorant_block_size=16,
                                    fastpath_unroll=unroll))
        fn = integ.batch_fn(source, N, n_lanes=1 << lanes_log)
        res = fn(jax.random.fold_in(key, 99))
        jax.block_until_ready(res.flux_up)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = fn(jax.random.fold_in(key, i))
            jax.block_until_ready(res.flux_up)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        print(f"L=2^{lanes_log} K={unroll:3d}: {N/dt/1e6:7.1f} Mphot/s "
              f"(dt={dt*1e3:.1f}ms)", flush=True)

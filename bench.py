"""Headline benchmark: photon throughput on the I3RC step cloud (one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 5e8 photons/sec/chip (BASELINE.json).

Workload: I3RC phase-1 case 1 (32x1x32 step cloud, tau 2/18, HG g=0.85,
conservative scattering), solar mu0=0.5, flux outputs — the reference's
shipped monteCarloDriver configuration domain.  Maximum cross-section
transport (the reference supports both; max-XS is the TPU-optimal default
for this domain).
"""

import json
import logging
import sys
import time

logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)


def main():
    import jax

    from __graft_entry__ import _step_cloud_integrator
    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.integrators.config import IntegratorConfig

    n_photons = 1 << 24
    # Measured optimum on v5e: 16-cell super-voxel majorants (Woodcock
    # tracking), column-keyed tallies (flux benchmark; no volume absorption
    # requested), 2^17 lanes with persistent-photon refill.  16M photons per
    # dispatch keeps lane occupancy ~94% (refill amortizes the drain tail).
    integ = _step_cloud_integrator(
        config=IntegratorConfig(use_ray_tracing=False, max_events=500,
                                compute_volume_absorption=False,
                                majorant_block_size=16))
    source = PhotonSource.directional(0.5, 0.0)
    fn = integ.batch_fn(source, n_photons, n_lanes=1 << 17)

    # Hardware RngBitGenerator for the wide per-event draws (keying stays
    # threefry); ~13% faster than all-threefry with identical statistics.
    key = jax.random.key(0, impl="rbg")
    # Warmup: compile + first-dispatch settling on the remote device
    for i in range(2):
        res = fn(jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(res.flux_up)
    # Timed runs: block each run; report the median (relay timing is noisy)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        res = fn(jax.random.fold_in(key, i))
        jax.block_until_ready(res.flux_up)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    photons_per_sec = n_photons / dt
    out = {
        "metric": "photons/sec/chip (I3RC step cloud, flux, max cross-section)",
        "value": photons_per_sec,
        "unit": "photons/s",
        "vs_baseline": photons_per_sec / 5e8,
    }
    print(json.dumps(out))
    # Sanity line on stderr so the JSON stdout contract stays clean.
    print(f"# Fup={float(res.mean_flux_up):.4f} Fdn={float(res.mean_flux_down):.4f} "
          f"bad={int(res.n_bad)} dt={dt * 1e3:.1f}ms device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

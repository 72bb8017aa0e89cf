"""TPU probe: fused-k band dispatch vs per-k baked fastpath executables.

Measures the steady-state spectral-loop rate for the bench step-cloud band
at several k counts, at EQUAL TOTAL PHOTONS per mode: baked traces
n_per_k photons for each of the n_k points; fused traces one dispatch of
n_per_k * n_k photons, internally partitioned across k by quadrature
weight (fastpath.GasKTables budgets).  Reports photons/s over the total
and the band-mean flux_up stderr so statistical efficiency is visible
alongside throughput.  Writes one JSON line per row to stdout; keep
host-side work minimal and exit promptly after device work (axon relay
etiquette).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from i3rc_tpu.core.illumination import PhotonSource
    from i3rc_tpu.core.k_distribution import KDistribution
    from i3rc_tpu.integrators.config import IntegratorConfig
    from i3rc_tpu.integrators.integrator import Integrator
    from i3rc_tpu.integrators.spectral import (
        domain_with_gas_component,
        run_band,
    )
    from i3rc_tpu.models.step_cloud import make_step_cloud

    n_per_k = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    with_radiance = "--radiance" in sys.argv
    n_batches = 2
    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=500,
                           compute_volume_absorption=False,
                           majorant_block_size=16)
    int_kw = (dict(intensity_mus=[1.0, 0.5, 0.5],
                   intensity_phis=[0.0, 0.0, 180.0])
              if with_radiance else {})

    # Baked mode needs one fastpath compile PER k point (~20-40s each on
    # the relay), so it is only measured at n_k=2 (the bench row's shape);
    # its per-photon rate is k-count-independent by construction.  Fused
    # mode compiles once per band regardless of n_k.
    for n_k in (2, 8):
        # Geometric ladder of gas strengths, equal-ish weights (realistic
        # correlated-k shape: most weight on weak k points).
        taus = 4e-4 * (10.0 ** np.linspace(0.0, 2.0, n_k))
        w = np.linspace(1.5, 0.5, n_k)
        w = w / w.sum()
        kd = KDistribution.create(
            z, np.broadcast_to(taus[:, None], (n_k, 32)).T.copy() / (z[-1] - z[0]),
            w, spectral_fraction=1.0)
        integ = Integrator.create(
            domain_with_gas_component(dom, kd.absorption_profiles_on(z)[:, 0]),
            config=cfg, **int_kw)
        n_total = n_per_k * n_k     # equal total photons in both modes
        modes = ("baked", "fused") if n_k == 2 else ("fused",)
        for mode in modes:
            # Both modes take per-k photons (run_band contract); fused
            # traces all n_per_k * n_k in one dispatch.
            kw = (dict(bake_fastpath=True) if mode == "baked"
                  else dict(fuse_k=True))
            n_pb = n_per_k
            cache = {}
            warm = run_band(integ, dom, kd, src, n_pb, n_batches,
                            seed=5, integrator_cache=cache, **kw)
            np.asarray(warm.mean.flux_up).ravel()[:1]
            t0 = time.perf_counter()
            band = run_band(integ, dom, kd, src, n_pb, n_batches,
                            seed=6, integrator_cache=cache, **kw)
            fup = float(np.asarray(band.mean.flux_up).mean())
            dt = time.perf_counter() - t0
            se = float(np.asarray(band.stderr.flux_up).mean())
            n_traced = n_total * n_batches
            print(json.dumps({
                "mode": mode, "n_k": n_k,
                "photons_per_s": n_traced / dt, "dt_s": dt,
                "flux_up": fup, "flux_up_stderr": se,
                "flux_down": float(np.asarray(band.mean.flux_down).mean()),
                "flux_abs": float(np.asarray(band.mean.flux_absorbed).mean()),
            }), flush=True)


if __name__ == "__main__":
    main()

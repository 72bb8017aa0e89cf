"""Run the I3RC benchmark configurations end-to-end and report results.

Covers the BASELINE.json config list:
  1. planeParallel homogeneous slab (fluxes vs plane-parallel regime)
  2. i3rcStepCloud (phase I case 1) with radiances at the standard angles
  3. i3rcRadarCloud (phase I case 2, HG and C.1 phase functions)
  4. i3rcLandsatCloud (phase I case 4)
  5. broadband spectral loop (k-distribution demo over the step cloud)

Prints one JSON document with mean +- stderr fields and throughput per case.

Usage: python benchmarks/i3rc_cases.py [--quick]
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)


def run_case(name, integrator, source, n_photons, n_batches, seed=10,
             derive=None, n_lanes=None):
    import jax

    from i3rc_tpu.parallel.mesh import run_batches

    # Warm-up/compile on a single batch
    t0 = time.perf_counter()
    integrator.batch_fn(source, n_photons, n_lanes=n_lanes)(jax.random.PRNGKey(0))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    stats = run_batches(integrator, source, n_photons, n_batches, seed=seed,
                        derive=derive, n_lanes=n_lanes)
    wall = time.perf_counter() - t0
    total_photons = n_photons * stats.n_batches
    out = {
        "case": name,
        "photons": total_photons,
        "batches": stats.n_batches,
        "photons_per_sec": total_photons / wall,
        "compile_seconds": round(compile_s, 1),
        "wall_seconds": round(wall, 2),
    }
    m, e = stats.mean, stats.stderr
    if derive is not None:
        m, e = m["derived"], e["derived"]
        for key in m:
            val = m[key]
            err = e[key]
            if getattr(val, "ndim", 0) == 0:
                out[key] = [round(float(val), 5), round(float(err), 5)]
            else:
                out[key] = [[round(float(v), 5) for v in val.ravel()],
                            [round(float(v), 5) for v in err.ravel()]]
    return out


def main(quick=False, only=None):
    import jax
    import numpy as np

    from i3rc_tpu import Integrator, IntegratorConfig, KDistribution, PhotonSource
    from i3rc_tpu.integrators.spectral import run_broadband
    from i3rc_tpu.models import (
        make_landsat_cloud,
        make_radar_cloud,
        make_slab_domain,
        make_step_cloud,
    )

    scale = 8 if quick else 1
    src = PhotonSource.directional(0.5, 0.0)
    flux_cfg = IntegratorConfig(use_ray_tracing=False, max_events=2000,
                                compute_volume_absorption=False,
                                majorant_block_size=16)

    def derive_fluxes(res):
        return {"flux_up": res.mean_flux_up, "flux_down": res.mean_flux_down,
                "flux_absorbed": res.mean_flux_absorbed}

    def derive_with_rad(res):
        d = derive_fluxes(res)
        d["radiance"] = res.mean_intensity
        return d

    reports = []

    def wanted(i):
        return only is None or i == only

    # 1. plane-parallel slab, tau=1 conservative
    if wanted(1):
        integ = Integrator.create(make_slab_domain(1.0, 1.0), config=flux_cfg)
        reports.append(run_case("planeParallel tau=1 ssa=1 g=0.85 mu0=0.5",
                                integ, src, (1 << 20) // scale, 8,
                                derive=derive_fluxes))

    # 2. step cloud with radiances at the standard I3RC angles
    if wanted(2):
        integ = Integrator.create(
            make_step_cloud(1.0),
            config=IntegratorConfig(use_ray_tracing=False, max_events=1000,
                                    use_russian_roulette_for_intensity=True,
                                    zeta_min=0.3, majorant_block_size=16),
            intensity_mus=[1.0, 0.5, 0.5], intensity_phis=[0.0, 0.0, 180.0])
        # Narrow lanes: the queued-radiance Iwabuchi executable compiles in
        # ~5.5 min and the bench relay has killed workers on back-to-back
        # long compiles; 2^14 lanes compiles in ~1/4 the time (persistent
        # compile cache also applies — utils/compile_cache).
        reports.append(run_case("stepCloud case1 + radiances",
                                integ, src, (1 << 18) // scale, 8,
                                derive=derive_with_rad, n_lanes=1 << 14))

    # 3. radar cloud (HG and C.1)
    if wanted(3):
        for pf in ("hg", "c1"):
            integ = Integrator.create(make_radar_cloud(pf, 1.0), config=flux_cfg)
            reports.append(run_case(f"radarCloud case2 {pf}",
                                    integ, src, (1 << 18) // scale, 4,
                                    derive=derive_fluxes))

    # 4. Landsat cloud (1.9M cells: serialized-gather path)
    if wanted(4):
        integ = Integrator.create(make_landsat_cloud(1.0), config=IntegratorConfig(
            use_ray_tracing=False, max_events=1000,
            compute_volume_absorption=False, majorant_block_size=16))
        reports.append(run_case("landsatCloud case4",
                                integ, src, (1 << 17) // scale, 4,
                                derive=derive_fluxes))

    # 5. broadband k-distribution loop over the step cloud
    if not wanted(5):
        dom = None
    if wanted(5):
        dom = make_step_cloud(1.0)
    if wanted(5):
        z = np.asarray(dom.z_edges)
        kd = [KDistribution.create(
            z, np.broadcast_to([[4e-4, 4e-3]], (32, 2)).copy(), [0.7, 0.3],
            wavelength_limits=(2.6, 2.8), spectral_fraction=1.0)]
        t0 = time.perf_counter()
        bb, _ = run_broadband(dom, kd, src, (1 << 17) // scale, 4, config=flux_cfg)
        reports.append({
            "case": "broadband kDistribution (1 band x 2 k) step cloud",
            "wall_seconds": round(time.perf_counter() - t0, 2),
            "flux_up": round(float(np.asarray(bb.flux_up).mean()), 5),
            "flux_absorbed": round(float(np.asarray(bb.flux_absorbed).mean()), 5),
        })

    doc = {"device": str(jax.devices()[0]), "reports": reports}
    print(json.dumps(doc, indent=1))
    return doc


if __name__ == "__main__":
    case = None
    for a in sys.argv[1:]:
        if a.startswith("--case="):
            case = int(a.split("=")[1])
    main(quick="--quick" in sys.argv, only=case)

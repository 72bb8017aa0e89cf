"""Broadband (k-distribution) fluxes AND radiances over the I3RC step cloud.

The capability the reference declares but never finished (kDistribution.f95
stubs): a correlated-k spectral loop.  This example builds a two-band gas
overlying the step cloud and runs the loop three ways, printing band and
broadband results with their standard errors:

  traced   one compile per band; each k point's optics ride through the
           same executable as traced arguments (works for EVERY workload,
           including volume absorption);
  baked    one fastpath compile per k point, cached across band runs
           (production steady state; ~20x traced);
  fused    every k point of a band in ONE dispatch of ONE executable
           (fastpath.GasKTables): k is a per-lane attribute, detectors
           ride the closed shadow trace with per-lane-k gas tau, and
           heating-rate bands (compute_volume_absorption) resolve gas
           deaths by inverting the lane's cumulative gas depth.

Run:  python examples/broadband_radiance.py [n_photons_per_batch] [--traced]
(CPU: prepend JAX_PLATFORMS=cpu.  The traced mode is the general wavefront
kernel — minutes per band on a single CPU core — so it only runs when
asked; fused + baked are the production modes and print first.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.core.k_distribution import KDistribution
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.spectral import run_broadband
from i3rc_tpu.models.step_cloud import make_step_cloud


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1 << 13
    with_traced = "--traced" in sys.argv
    dom = make_step_cloud(1.0)
    z = np.asarray(dom.z_edges)

    # Two bands: a weak visible-like band (90% of the spectrum) and a
    # stronger absorption band, two k points each (profiles in 1/km on the
    # domain's 32 layers; realistic correlated-k shape — most weight on
    # the weak k point).
    kds = [
        KDistribution.create(
            z, np.broadcast_to([[2e-4], [2e-3]], (2, 32)).T.copy(),
            [0.8, 0.2], wavelength_limits=(0.5, 0.7), spectral_fraction=0.9),
        KDistribution.create(
            z, np.broadcast_to([[2e-3], [4e-2]], (2, 32)).T.copy(),
            [0.6, 0.4], wavelength_limits=(2.6, 2.8), spectral_fraction=0.1),
    ]
    src = PhotonSource.directional(0.5, 0.0)
    cfg = IntegratorConfig(use_ray_tracing=False, max_events=200,
                           compute_volume_absorption=False)
    mus, phis = [1.0, 0.5], [0.0, 0.0]

    cache = {}
    modes = [("fused", dict(fuse_k=True)),
             ("baked", dict(bake_fastpath=True))]
    if with_traced:
        modes.append(("traced", {}))
    for mode, kw in modes:
        t0 = time.perf_counter()
        broadband, bands = run_broadband(
            dom, kds, src, n, 4, seed=11, config=cfg,
            intensity_mus=mus, intensity_phis=phis,
            integrator_cache=cache, **kw)
        fup = float(np.asarray(broadband.flux_up).mean())
        fdn = float(np.asarray(broadband.flux_down).mean())
        fab = float(np.asarray(broadband.flux_absorbed).mean())
        dt = time.perf_counter() - t0
        print(f"[{mode:6s}] broadband Fup {fup:.4f}  Fdn {fdn:.4f}  "
              f"Fabs {fab:.4f}  closure {fup + fdn + fab:.5f}  ({dt:.1f}s)",
              flush=True)
        for b, band in enumerate(bands):
            i_mean = np.asarray(band.mean.intensity).reshape(-1, 2).mean(0)
            i_se = np.asarray(band.stderr.intensity).reshape(-1, 2).mean(0)
            lam = band.wavelength_limits
            print(f"         band {lam[0]:.1f}-{lam[1]:.1f}um  "
                  + "  ".join(f"I(mu={m}) {v:.4f}+-{s:.4f}"
                              for m, v, s in zip(mus, i_mean, i_se)))


if __name__ == "__main__":
    main()

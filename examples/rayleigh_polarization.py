"""Rayleigh sky polarization: Stokes radiance scan across scattering angle.

Demonstrates polarized (Stokes-vector) transport — the reference
Wishlist's most ambitious item (/root/reference/Wishlist.txt:20-31),
never built in the Fortran: a clear conservative Rayleigh atmosphere
under slant sun, with upward detectors scanning the principal plane so
the classic polarization signature is visible directly — the degree of
linear polarization peaks where the single-scattering angle passes 90
degrees and multiple scattering + depolarization pull it below the
Rayleigh limit.

Run (CPU is fine; ~1 min):
    python examples/rayleigh_polarization.py [tau] [depolarization]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from i3rc_tpu import (
    Domain,
    PhaseMatrix,
    PhaseMatrixTable,
    PhotonSource,
    PolarizedIntegrator,
)
from i3rc_tpu.integrators.config import IntegratorConfig


def main(tau=0.4, depol=0.03):
    table = PhaseMatrixTable.from_phase_matrices(
        [PhaseMatrix.rayleigh(depolarization=depol)], key=[1.0])
    dom = Domain.create([0.0, 1000.0], [0.0, 1000.0],
                        np.linspace(0.0, 8000.0, 9))
    ext = np.full((1, 1, 8), tau / 8000.0)
    dom = dom.add_component("rayleigh", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)

    mu0 = 0.5                       # sun at 60 degrees zenith
    # Upward detectors across the principal plane (the sun's azimuth and
    # its opposite): view zenith 0..72 degrees on both sides.
    view_mu = np.array([0.99, 0.9, 0.75, 0.6, 0.45, 0.31])
    mus = np.concatenate([view_mu, view_mu[1:]])
    phis = np.concatenate([np.zeros_like(view_mu), np.full(view_mu.size - 1,
                                                           180.0)])
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=200),
        intensity_mus=mus, intensity_phis=phis)
    res = integ.compute(jax.random.PRNGKey(0),
                        PhotonSource.directional(mu0, 0.0), 2_000_000)

    s = np.asarray(res.mean_intensity)          # (D, 4)
    dop = np.asarray(res.degree_of_polarization)
    d0 = np.array([np.sqrt(1 - mu0 ** 2), 0.0, -mu0])
    print(f"# Rayleigh tau={tau} depol={depol} mu0={mu0}  "
          f"Fup={float(res.mean_flux_up):.4f}")
    print("#  mu_v   phi_v  Theta_ss     I         Q         U      DoP")
    for k in range(mus.size):
        sd = np.sqrt(1 - mus[k] ** 2)
        det = np.array([sd * np.cos(np.deg2rad(phis[k])),
                        sd * np.sin(np.deg2rad(phis[k])), mus[k]])
        theta = np.degrees(np.arccos(np.clip(d0 @ det, -1, 1)))
        print(f"  {mus[k]:5.2f}  {phis[k]:6.1f}  {theta:7.1f}"
              f"  {s[k, 0]:8.4f}  {s[k, 1]:8.4f}  {s[k, 2]:8.4f}"
              f"  {dop[k]:5.3f}")
    peak = int(np.argmax(dop))
    print(f"# DoP peaks at view mu={mus[peak]:.2f} phi={phis[peak]:.0f} "
          f"(scattering angle nearest 90 degrees), as Rayleigh predicts.")


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    main(*args)

"""Deterministic discrete-ordinates slab oracle (DISORT-style eigenmodes).

An INDEPENDENT method for plane-parallel fluxes: the azimuthally-averaged
radiative transfer equation is discretized in angle (double-Gauss nodes) and
solved exactly in tau by eigen-decomposition — no Monte Carlo, no shared
code with the framework's transport kernels.  It exists to give the test
suite an external oracle in an offline environment: the published I3RC
intercomparison tables and a Fortran compiler for the reference are both
unavailable here (no network egress; documented in BENCH_CASES.md), and the
reference's own de-facto verification path is exactly this comparison — the
planeParallel driver "compares the results from new or modified Monte Carlo
solvers with the fluxes ... computed using other methods"
(Example-Drivers/planeParallel.f95:12-16).

Geometry/conventions: tau increases downward; mu > 0 is downward; a
collimated beam of 1 photon per unit horizontal area enters the top along
mu0.  Returns (R, T_total): upward exit fraction at the top and total
(direct + diffuse) downward exit fraction at the base, over a black surface.

Self-checks (test_external_validation.py): pure absorption reproduces
Beer-Lambert exactly; stream-count convergence; energy closure for
conservative scattering.
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial.legendre import leggauss


def _legendre_matrix(mu: np.ndarray, n_l: int) -> np.ndarray:
    """P[l, i] = P_l(mu_i) by the three-term recursion, l = 0..n_l."""
    p = np.zeros((n_l + 1, mu.size))
    p[0] = 1.0
    if n_l >= 1:
        p[1] = mu
    for l in range(1, n_l):
        p[l + 1] = ((2 * l + 1) * mu * p[l] - l * p[l - 1]) / (l + 1)
    return p


def slab_fluxes(tau: float, omega: float, chi: np.ndarray, mu0: float,
                n_streams: int = 48):
    """(R, T_total) for a homogeneous slab over a black surface.

    chi: Legendre coefficients chi_1..chi_L of the phase function in the
    reference's convention (P = sum (2l+1) chi_l P_l, chi_0 = 1 implicit) —
    HG is chi_l = g**l (Code/scatteringPhaseFunctions.f95 usage;
    i3rcStepCloud.f95:56).
    """
    chi = np.asarray(chi, dtype=np.float64)
    chi_full = np.concatenate([[1.0], chi])
    n_l = chi_full.size - 1

    # Conservative scattering: the transport operator becomes singular
    # (a Jordan block at eigenvalue 0).  Nudge omega; the flux error is
    # O(tau * 1e-9), far below every tolerance used against this oracle.
    omega = min(float(omega), 1.0 - 1e-9)

    # Double-Gauss: N nodes per hemisphere, mapped from (0, 1).
    xg, wg = leggauss(n_streams)
    mu_half = 0.5 * (xg + 1.0)
    w_half = 0.5 * wg
    mu = np.concatenate([mu_half, -mu_half])       # (2N,) down then up
    w = np.concatenate([w_half, w_half])

    pl_nodes = _legendre_matrix(mu, n_l)           # (n_l+1, 2N)
    coef = (2 * np.arange(n_l + 1) + 1) * chi_full
    # p0[i, j] = sum_l (2l+1) chi_l P_l(mu_i) P_l(mu_j): azimuth-averaged
    # phase function between quadrature directions.
    p0 = np.einsum("l,li,lj->ij", coef, pl_nodes, pl_nodes)
    pl_beam = _legendre_matrix(np.array([mu0]), n_l)[:, 0]
    p0_beam = np.einsum("l,li->i", coef * pl_beam, pl_nodes)

    # mu_i dL_i/dtau = -L_i + (omega/2) sum_j w_j p0_ij L_j + j_i e^(-tau/mu0)
    # with j_i = (omega / (4 pi)) p0(mu_i, mu0) / mu0 ... radiance source per
    # unit tau from the direct beam (1 photon / unit area incident).
    inv_mu = 1.0 / mu
    m = (-np.eye(2 * n_streams) + 0.5 * omega * p0 * w[None, :]) * inv_mu[:, None]
    # Source vector: beam scatters omega/mu0 photons per unit tau; angular
    # density p0_beam / (4 pi); the 2 pi azimuth integral is folded into the
    # flux quadrature below, so the RTE uses radiance-per-azimuth-radian
    # units consistently on both source and flux sides.
    b = (omega / (4.0 * np.pi)) * p0_beam / mu0 * inv_mu

    lam, v = np.linalg.eig(m)
    lam = np.real(lam)
    v = np.real(v)

    # Particular solution for the exponential beam source.
    lp = np.linalg.solve(m + np.eye(2 * n_streams) / mu0, -b)

    # Stable basis: decaying modes anchored at the top, growing at the base.
    grow = lam > 0
    # Boundary conditions: no diffuse downward radiance at tau=0, none
    # upward at tau=tau_L.
    down = mu > 0
    up = ~down
    a_mat = np.zeros((2 * n_streams, 2 * n_streams))
    rhs = np.zeros(2 * n_streams)
    f_top = np.where(grow, np.exp(-np.abs(lam) * tau), 1.0)    # e^(lam(0-tauL)) scaled
    f_bot = np.where(grow, 1.0, np.exp(-np.abs(lam) * tau))
    a_mat[: n_streams, :] = v[down, :] * f_top[None, :]
    rhs[: n_streams] = -lp[down]
    a_mat[n_streams:, :] = v[up, :] * f_bot[None, :]
    rhs[n_streams:] = -lp[up] * np.exp(-tau / mu0)
    c = np.linalg.solve(a_mat, rhs)

    def radiance(tau_eval: float) -> np.ndarray:
        f = np.where(grow, np.exp(np.abs(lam) * (tau_eval - tau)),
                     np.exp(-np.abs(lam) * tau_eval))
        return v @ (c * f) + lp * np.exp(-tau_eval / mu0)

    l_top = radiance(0.0)
    l_bot = radiance(tau)
    # Hemispheric photon fluxes: 2 pi int L |mu| dmu.
    r_up = 2.0 * np.pi * np.sum(w[up] * np.abs(mu[up]) * l_top[up])
    t_dif = 2.0 * np.pi * np.sum(w[down] * mu[down] * l_bot[down])
    t_total = t_dif + np.exp(-tau / mu0)
    return float(r_up), float(t_total)


def hg_slab_fluxes(tau: float, omega: float, g: float, mu0: float,
                   n_legendre: int = 96, n_streams: int = 48):
    """slab_fluxes for a Henyey-Greenstein phase function (chi_l = g^l)."""
    chi = g ** np.arange(1, n_legendre + 1)
    return slab_fluxes(tau, omega, chi, mu0, n_streams=n_streams)

"""Variance-reduction machinery and backward-MC source tests.

Covers the reference's intensity toolbox: Iwabuchi Russian roulette, hybrid
phase functions, original-phase-function orders, Barker contribution
limiting with excess redistribution — plus the internal (backward-MC)
photon sources and the spotlight source.
"""

import jax
import numpy as np
import pytest

from i3rc_tpu import Domain, Integrator, IntegratorConfig, PhotonSource
from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
)


def slab(tau, ssa=1.0, g=0.85, n_layers=2):
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(g, 64))],
        key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250.0, n_layers + 1))
    ext = np.full((1, 1, n_layers), tau / 250.0)
    return dom.add_component("cloud", ext, np.full_like(ext, ssa),
                             np.zeros(ext.shape, np.int32), table)


MUS = [1.0, 0.4]
PHIS = [0.0, 60.0]
N = 100_000


@pytest.fixture(scope="module")
def plain_radiance():
    integ = Integrator.create(slab(1.0), intensity_mus=MUS, intensity_phis=PHIS)
    res = integ.compute(jax.random.PRNGKey(0), PhotonSource.directional(0.6, 0.0), N)
    return np.asarray(res.mean_intensity)


def test_iwabuchi_rr_unbiased(plain_radiance):
    """Iwabuchi intensity roulette agrees with the full-trace estimator."""
    integ = Integrator.create(
        slab(1.0),
        config=IntegratorConfig(use_russian_roulette_for_intensity=True, zeta_min=0.3),
        intensity_mus=MUS, intensity_phis=PHIS)
    res = integ.compute(jax.random.PRNGKey(1), PhotonSource.directional(0.6, 0.0), N)
    rad = np.asarray(res.mean_intensity)
    np.testing.assert_allclose(rad, plain_radiance, rtol=0.06)


def test_ratio_tracking_unbiased():
    """Null-collision transmittance estimator agrees with the exact trace.

    Compared batch-wise with a 3-sigma band: in a uniform slab the majorant
    equals the extinction, so ratio tracking degenerates to the analog
    (Bernoulli) transmittance — unbiased but with more variance than the
    deterministic exp(-tau), hence the statistical comparison.
    """
    from i3rc_tpu.parallel.mesh import run_batches

    src = PhotonSource.directional(0.6, 0.0)
    stats = {}
    for tag, cfg in (("plain", IntegratorConfig()),
                     ("ratio", IntegratorConfig(
                         use_ratio_tracking_for_intensity=True,
                         use_ray_tracing=False, majorant_block_size=1))):
        integ = Integrator.create(slab(1.0), config=cfg,
                                  intensity_mus=MUS, intensity_phis=PHIS)
        stats[tag] = run_batches(integ, src, 20_000, 16, seed=9,
                                 derive=lambda r: {"I": r.mean_intensity})
    m_p = np.asarray(stats["plain"].mean["derived"]["I"])
    m_r = np.asarray(stats["ratio"].mean["derived"]["I"])
    sig = (np.asarray(stats["plain"].stderr["derived"]["I"])
           + np.asarray(stats["ratio"].stderr["derived"]["I"]))
    assert np.all(np.abs(m_p - m_r) < 3.0 * sig + 1e-4 * m_p)


def test_ratio_tracking_requires_majorants():
    """Config downgrade: ratio tracking without super-voxels falls back."""
    cfg = IntegratorConfig(use_ratio_tracking_for_intensity=True,
                           majorant_block_size=0)
    with pytest.warns(Warning):
        cfg = cfg.validate()
    assert cfg.use_ratio_tracking_for_intensity is False


def test_hybrid_phase_functions(plain_radiance):
    """Hybrid Gaussian-peak local estimation stays close to the original."""
    integ = Integrator.create(
        slab(1.0),
        config=IntegratorConfig(use_hybrid_phase_funs=True, hybrid_phase_fun_width=7.0),
        intensity_mus=MUS, intensity_phis=PHIS)
    res = integ.compute(jax.random.PRNGKey(2), PhotonSource.directional(0.6, 0.0), N)
    rad = np.asarray(res.mean_intensity)
    # The smoothed estimator is slightly biased near the forward peak by
    # construction; away from it agreement should be close.
    np.testing.assert_allclose(rad, plain_radiance, rtol=0.12)
    assert np.all(rad > 0)


def test_hybrid_with_orig_orders(plain_radiance):
    integ = Integrator.create(
        slab(1.0),
        config=IntegratorConfig(use_hybrid_phase_funs=True, hybrid_phase_fun_width=7.0,
                                num_orders_orig_phase_fun=1),
        intensity_mus=MUS, intensity_phis=PHIS)
    res = integ.compute(jax.random.PRNGKey(3), PhotonSource.directional(0.6, 0.0), N)
    np.testing.assert_allclose(np.asarray(res.mean_intensity), plain_radiance,
                               rtol=0.12)


def test_barker_clipping_redistributes(plain_radiance):
    """Contribution limiting preserves the domain-mean radiance.

    Excess above the cap is redistributed proportionally to each component's
    spatial pattern (monteCarloRadiativeTransfer.f95:327-347), so the mean
    is conserved even with an aggressive cap.
    """
    integ = Integrator.create(
        slab(1.0),
        config=IntegratorConfig(limit_intensity_contributions=True,
                                max_intensity_contribution=0.05),
        intensity_mus=MUS, intensity_phis=PHIS)
    res = integ.compute(jax.random.PRNGKey(4), PhotonSource.directional(0.6, 0.0), N)
    rad = np.asarray(res.mean_intensity)
    np.testing.assert_allclose(rad, plain_radiance, rtol=0.08)


def test_internal_flux_detector_beer_lambert():
    """Backward-MC hemispheric detector: upward transmission closed form.

    Photons start at z = h with mu = sqrt(u); the fraction reaching the top
    of a purely absorbing slab is E[exp(-tau_above / mu)]
    = int_0^1 exp(-tau/sqrt(u)) du.
    """
    tau_above = 0.8
    dom = slab(2.0, ssa=0.0, n_layers=5)  # tau=2 total; detector at z=0.6 (tau_above=0.8)
    integ = Integrator.create(dom)
    src = PhotonSource.internal_flux(0.5, 0.5, 0.6, detector_points_up=True)
    res = integ.compute(jax.random.PRNGKey(5), src, N)
    u = (np.arange(200_000) + 0.5) / 200_000
    expected = np.mean(np.exp(-tau_above / np.sqrt(u)))
    got = float(res.mean_flux_up)
    assert got == pytest.approx(expected, rel=0.02), (got, expected)


def test_internal_intensity_detector():
    """Backward-MC directional detector: single direction, pure absorption."""
    mu_det = 0.8
    tau_above = 0.8
    dom = slab(2.0, ssa=0.0, n_layers=5)
    integ = Integrator.create(dom)
    src = PhotonSource.internal_intensity(0.5, 0.5, 0.6, mu_det, 30.0)
    res = integ.compute(jax.random.PRNGKey(6), src, 200_000)
    expected = np.exp(-tau_above / mu_det)  # binomial sigma_rel ~ 0.3%: 4-sigma gate
    assert float(res.mean_flux_up) == pytest.approx(expected, rel=1.2e-2)


def test_spotlight_source_single_column():
    """Spotlight: everything lands in one column of a transparent medium."""
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    dom = Domain.create(np.linspace(0, 500, 9), [0, 500.0], [0.0, 250.0])
    ext = np.full((8, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    integ = Integrator.create(dom)
    # x = 0.3 -> column 2 of 8 (vertical beam, mu = -1)
    src = PhotonSource.spotlight(1.0, 0.0, 0.3, 0.5)
    res = integ.compute(jax.random.PRNGKey(7), src, 20_000)
    fdn = np.asarray(res.flux_down)[:, 0]
    assert fdn[2] > 0.99 * 8  # all weight in one of 8 columns (normalized)
    assert np.all(fdn[np.arange(8) != 2] == 0.0)


def test_intensity_mode_agreement_maxxs_vs_raytrace():
    """Radiances agree between transport modes (different event streams)."""
    out = []
    for rt in (True, False):
        integ = Integrator.create(
            slab(1.0), config=IntegratorConfig(use_ray_tracing=rt),
            intensity_mus=MUS, intensity_phis=PHIS)
        res = integ.compute(jax.random.PRNGKey(8), PhotonSource.directional(0.6, 0.0),
                            50_000)
        out.append(np.asarray(res.mean_intensity))
    np.testing.assert_allclose(out[0], out[1], rtol=0.08)

"""Irregular grids, reconfiguration, textured and non-Lambertian surfaces."""

import jax
import numpy as np
import pytest

from i3rc_tpu import (
    Domain,
    Integrator,
    IntegratorConfig,
    PhotonSource,
    SurfaceDescription,
)
from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
)


def hg_table(g=0.85):
    return PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(g, 32))],
        key=[1.0])


def test_irregular_z_grid_energy_closure():
    """Geometrically stretched layers: same physics as the regular grid."""
    z = np.array([0.0, 10.0, 35.0, 80.0, 150.0, 250.0])
    dom = Domain.create([0, 500.0], [0, 500.0], z)
    ext = np.full((1, 1, 5), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    assert not dom.z_regularly_spaced
    for rt in (True, False):
        integ = Integrator.create(dom, config=IntegratorConfig(use_ray_tracing=rt))
        res = integ.compute(jax.random.PRNGKey(1), PhotonSource.directional(0.5, 0.0),
                            100_000)
        total = float(res.mean_flux_up + res.mean_flux_down)
        assert total == pytest.approx(1.0, abs=2e-3), rt
        # Same slab as the regular-grid reference value (tau = 2)
        assert 0.26 < float(res.mean_flux_up) < 0.31


def test_irregular_xy_grid_columns():
    """Non-uniform columns: area-weighted normalization (reference :358-367)."""
    x = np.array([0.0, 100.0, 500.0])  # 1:4 column widths
    dom = Domain.create(x, [0, 500.0], [0.0, 250.0])
    ext = np.full((2, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    assert not dom.xy_regularly_spaced
    integ = Integrator.create(dom)
    res = integ.compute(jax.random.PRNGKey(2), PhotonSource.directional(1.0, 0.0),
                        200_000)
    fdn = np.asarray(res.flux_down)[:, 0]
    # Both columns receive unit flux density despite 4x area difference.
    np.testing.assert_allclose(fdn, 1.0, atol=0.02)


def test_with_params_reconfigures():
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    integ = Integrator.create(dom)
    integ2 = integ.with_params(use_ray_tracing=False, surface_albedo=0.3,
                               intensity_mus=[0.5], intensity_phis=[0.0])
    assert integ2.config.use_ray_tracing is False
    assert integ2.surface.albedo == pytest.approx(0.3)
    assert integ2.intensity.n_directions == 1
    with pytest.raises(TypeError):
        integ.with_params(bogus_parameter=1)
    res = integ2.compute(jax.random.PRNGKey(3), PhotonSource.directional(0.5, 0.0),
                         20_000)
    assert res.intensity.shape == (1, 1, 1)


def test_textured_lambertian_surface():
    """x-varying albedo: bright columns reflect more.

    The domain is shallow (1 m under 125 m columns) so reflected photons
    exit the top in the column they reflected from — flux_up tallies at the
    exit column, like the reference (:499-514).
    """
    dom = Domain.create(np.linspace(0, 500, 5), [0, 500.0], [0.0, 1.0])
    ext = np.full((4, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    params = np.zeros((4, 1, 1), np.float32)
    params[:, 0, 0] = [0.0, 0.2, 0.4, 0.8]
    surface = SurfaceDescription.create(params, np.linspace(0, 500, 5), [0, 500.0])
    integ = Integrator.create(dom, surface=surface)
    res = integ.compute(jax.random.PRNGKey(4), PhotonSource.directional(1.0, 0.0),
                        200_000)
    fup = np.asarray(res.flux_up)[:, 0]
    np.testing.assert_allclose(fup, [0.0, 0.2, 0.4, 0.8], atol=0.02)


def test_rpv_brdf_surface():
    """Non-Lambertian (RPV) surface: runs, reflects, conserves energy bounds."""
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    surface = SurfaceDescription.uniform([0.2, 0.8, -0.1], brdf_name="rpv")
    integ = Integrator.create(dom, surface=surface)
    res = integ.compute(jax.random.PRNGKey(5), PhotonSource.directional(0.6, 0.0),
                        50_000)
    fup = float(res.mean_flux_up)
    assert 0.0 < fup < 1.0
    assert float(res.mean_flux_down) == pytest.approx(1.0, abs=5e-3)


def test_cox_munk_nadir_matches_closed_form():
    """Nadir-to-nadir glint: pi * P(0) * F(0) / 4 in closed form."""
    from i3rc_tpu.core.surface import cox_munk_brdf

    wind, n = 5.0, 1.34
    r = cox_munk_brdf(np.array([[wind, n]], np.float32),
                      np.array([-1.0]), np.array([1.0]),
                      np.array([0.0]), np.array([0.0]))
    sigma2 = 0.003 + 0.00512 * wind
    expected = np.pi * (1.0 / (np.pi * sigma2)) * ((n - 1) / (n + 1)) ** 2 / 4.0
    assert float(r[0]) == pytest.approx(expected, rel=1e-4)


def test_cox_munk_reciprocity_and_glint_peak():
    """f_r is reciprocal; the glint lobe peaks at the specular geometry."""
    from i3rc_tpu.core.surface import cox_munk_brdf

    rng = np.random.default_rng(0)
    mu_a = rng.uniform(0.3, 1.0, 8).astype(np.float32)
    mu_b = rng.uniform(0.3, 1.0, 8).astype(np.float32)
    ph_a = rng.uniform(0.0, 2 * np.pi, 8).astype(np.float32)
    ph_b = rng.uniform(0.0, 2 * np.pi, 8).astype(np.float32)
    params = np.tile(np.array([7.0, 1.33], np.float32), (8, 1))
    fwd = np.asarray(cox_munk_brdf(params, -mu_a, mu_b, ph_a, ph_b))
    rev = np.asarray(cox_munk_brdf(params, -mu_b, mu_a, ph_b, ph_a))
    np.testing.assert_allclose(fwd, rev, rtol=1e-4)
    # 45-degree incidence: specular keeps the propagation azimuth.
    s = np.sqrt(0.5, dtype=np.float32)
    spec = cox_munk_brdf(params[:1], np.array([-s]), np.array([s]),
                         np.array([0.0]), np.array([0.0]))
    back = cox_munk_brdf(params[:1], np.array([-s]), np.array([s]),
                         np.array([0.0]), np.array([np.pi]))
    assert float(spec[0]) > 100.0 * float(back[0])


def test_ross_li_nadir_and_hotspot():
    """Nadir-nadir reduces to f_iso; the hotspot beats forward scatter."""
    from i3rc_tpu.core.surface import ross_li_brdf

    params = np.array([[0.3, 0.5, 0.2]], np.float32)
    nadir = ross_li_brdf(params, np.array([-1.0]), np.array([1.0]),
                         np.array([0.0]), np.array([1.3]))
    assert float(nadir[0]) == pytest.approx(0.3, abs=1e-5)
    s = np.sqrt(0.5, dtype=np.float32)
    # Hotspot = reversed propagation azimuth; forward = same azimuth.
    hot = ross_li_brdf(params, np.array([-s]), np.array([s]),
                       np.array([0.0]), np.array([np.pi]))
    fwd = ross_li_brdf(params, np.array([-s]), np.array([s]),
                       np.array([0.0]), np.array([0.0]))
    assert float(hot[0]) > float(fwd[0]) + 0.3


def test_cox_munk_surface_integrator():
    """Ocean-glint surface through the general kernel: runs, small Fup."""
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-9)
    dom = dom.add_component("thin", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    surface = SurfaceDescription.uniform([7.0, 1.34], brdf_name="cox_munk")
    integ = Integrator.create(dom, surface=surface)
    res = integ.compute(jax.random.PRNGKey(6), PhotonSource.directional(0.866, 0.0),
                        100_000)
    fup = float(res.mean_flux_up)
    # Directional-hemispherical ocean reflectance at 30 degrees is a few
    # percent (Fresnel-bounded); cosine-sampled glint is high-variance, so
    # only order-of-magnitude bounds are asserted.
    assert 0.0 < fup < 0.3
    assert float(res.mean_flux_down) == pytest.approx(1.0, abs=5e-3)

def test_brdf_surface_radiance_closed_form():
    """Vacuum + Cox-Munk glint: I(det) = R(sun->det)/pi, deterministically.

    The surface local estimate must evaluate the BRDF toward each DETECTOR
    direction with the pre-reflection weight; the reference's 1/pi with the
    post-reflection weight (monteCarloRadiativeTransfer.f95:1473-1480) is
    exact only for Lambertian surfaces (it replaces a peaked lobe with its
    hemispheric average).  In a vacuum every photon reaches the surface with
    weight 1 and escapes with transmission 1, so each upward detector reads
    exactly R(mu0 -> mu_d, dphi)/pi and each downward detector reads 0.
    Exercises both the queued and the inline estimator.
    """
    from i3rc_tpu.core.surface import cox_munk_brdf

    mu0, az0 = 0.707, 30.0          # solar cosine, propagation azimuth (deg)
    wind, n_refr = 7.0, 1.34
    mus = [0.707, 0.5, 0.9, -0.5]   # last: downward detector, expects 0
    phis = [30.0, 210.0, 75.0, 0.0]

    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-12)
    dom = dom.add_component("vac", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    surface = SurfaceDescription.uniform([wind, n_refr], brdf_name="cox_munk")

    params = np.array([[wind, n_refr]], np.float32)
    expected = [
        float(cox_munk_brdf(params, np.array([-mu0], np.float32),
                            np.array([m], np.float32),
                            np.array([np.deg2rad(az0)], np.float32),
                            np.array([np.deg2rad(p)], np.float32))[0]) / np.pi
        if m > 0 else 0.0
        for m, p in zip(mus, phis)]

    for queued in (True, False):
        integ = Integrator.create(
            dom, surface=surface,
            config=IntegratorConfig(use_queued_intensity=queued),
            intensity_mus=mus, intensity_phis=phis)
        res = integ.compute(jax.random.PRNGKey(7),
                            PhotonSource.directional(mu0, az0), 8192)
        got = np.asarray(res.mean_intensity, np.float64)
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=1e-7,
                                   err_msg=f"queued={queued}")


def test_brdf_lambertian_equivalence_radiance():
    """A 'lambertian' BRDF surface reproduces the scalar-albedo radiances.

    The BRDF estimator path (pre-reflection weight, R(in->det)/pi in the
    prefactor) and the reference-exact albedo path (post-reflection weight,
    1/pi) are algebraically identical when R is constant; the RNG streams
    coincide, so a multiply-scattering slab over A=0.4 must agree to float
    rounding, fluxes and every detector alike.
    """
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 2.0 / 250.0)
    dom = dom.add_component("cloud", ext, np.full_like(ext, 0.99),
                            np.zeros(ext.shape, np.int32), hg_table())
    mus, phis = [0.707, 0.4, -0.6], [0.0, 120.0, 45.0]
    kw = dict(intensity_mus=mus, intensity_phis=phis)
    res_a = Integrator.create(dom, surface_albedo=0.4, **kw).compute(
        jax.random.PRNGKey(11), PhotonSource.directional(0.6, 0.0), 60_000)
    res_b = Integrator.create(
        dom, surface=SurfaceDescription.uniform([0.4]), **kw).compute(
        jax.random.PRNGKey(11), PhotonSource.directional(0.6, 0.0), 60_000)
    np.testing.assert_allclose(np.asarray(res_b.mean_intensity),
                               np.asarray(res_a.mean_intensity), rtol=1e-4)
    assert float(res_b.mean_flux_up) == pytest.approx(
        float(res_a.mean_flux_up), rel=1e-5)

def test_clamped_brdf_still_estimates_every_surface_hit():
    """Ross-Li with an 89%-clamped lobe: detectors read R(det)/pi exactly.

    With f = [0.08, 0, 0.25] at mu0 = 0.707, ~89% of cosine-sampled outgoing
    directions clamp to R = 0 (the photon dies at the surface) while the
    hotspot detector's R is 0.227.  The local estimate must fire on EVERY
    surface hit — gating it on the sampled direction's reflected weight
    (exact for Lambertian/albedo surfaces) would bias these detectors low by
    the clamp fraction, reading ~11% of the closed form.
    """
    from i3rc_tpu.core.surface import ross_li_brdf

    mu0 = 0.707
    f = [0.08, 0.0, 0.25]
    mus = [0.707, 0.5, 0.9]            # last one: R clamps to 0 exactly
    phis = [180.0, 180.0, 180.0]       # hotspot = reversed propagation azimuth

    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1e-12)
    dom = dom.add_component("vac", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), hg_table())
    surface = SurfaceDescription.uniform(f, brdf_name="ross_li")

    params = np.array([f], np.float32)
    expected = [
        float(ross_li_brdf(params, np.array([-mu0], np.float32),
                           np.array([m], np.float32),
                           np.array([0.0], np.float32),
                           np.array([np.deg2rad(p)], np.float32))[0]) / np.pi
        for m, p in zip(mus, phis)]
    assert expected[0] > 0.07 and expected[2] == 0.0  # the discriminating setup

    for queued in (True, False):
        integ = Integrator.create(
            dom, surface=surface,
            config=IntegratorConfig(use_queued_intensity=queued),
            intensity_mus=mus, intensity_phis=phis)
        res = integ.compute(jax.random.PRNGKey(3),
                            PhotonSource.directional(mu0, 0.0), 8192)
        np.testing.assert_allclose(np.asarray(res.mean_intensity, np.float64),
                                   expected, rtol=2e-3, atol=1e-7,
                                   err_msg=f"queued={queued}")

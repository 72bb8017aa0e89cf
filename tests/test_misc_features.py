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

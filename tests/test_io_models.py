"""netCDF round trips and I3RC scene generators."""

import numpy as np
import pytest

from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
    henyey_greenstein_values,
)
from i3rc_tpu.io.netcdf import (
    read_domain,
    read_phase_function_table,
    write_domain,
    write_phase_function_table,
)
from i3rc_tpu.models import (
    make_landsat_cloud,
    make_radar_cloud,
    make_slab_domain,
    make_step_cloud,
)
from i3rc_tpu.models.step_cloud import write_domains as write_step_domains


def test_phase_table_roundtrip_legendre(tmp_path):
    pfs = [PhaseFunction.from_legendre(henyey_greenstein_coefficients(g, 16),
                                       extinction=2.0 * g, single_scattering_albedo=0.9)
           for g in (0.3, 0.6, 0.8)]
    table = PhaseFunctionTable.from_phase_functions(pfs, key=[1.0, 2.0, 3.0],
                                                    description="test table")
    path = str(tmp_path / "table_leg.pft")
    write_phase_function_table(table, path)
    back = read_phase_function_table(path)
    assert back.n_entries == 3
    np.testing.assert_allclose(back.key, table.key)
    np.testing.assert_allclose(back.extinctions, table.extinctions, rtol=1e-6)
    for orig, rt in zip(table.phase_functions, back.phase_functions):
        np.testing.assert_allclose(rt.legendre_coefficients,
                                   orig.legendre_coefficients, rtol=1e-6)


def test_phase_table_roundtrip_tabulated(tmp_path):
    angles = np.linspace(0, np.pi, 501)
    values = np.stack([henyey_greenstein_values(g, angles) for g in (0.2, 0.7)], axis=1)
    table = PhaseFunctionTable.from_tabulated(angles, values, key=[5.0, 10.0])
    path = str(tmp_path / "table_tab.pft")
    write_phase_function_table(table, path)
    back = read_phase_function_table(path)
    test_angles = np.linspace(0.01, np.pi, 40)
    np.testing.assert_allclose(back.values(test_angles), table.values(test_angles),
                               rtol=1e-5)


def test_domain_roundtrip(tmp_path):
    dom = make_step_cloud(0.99)
    path = str(tmp_path / "step.opt")
    write_domain(dom, path)
    back = read_domain(path)
    assert back.grid_shape == dom.grid_shape
    np.testing.assert_allclose(back.x_edges, dom.x_edges, rtol=1e-6)
    c0, c1 = dom.components[0], back.components[0]
    assert c1.name == c0.name
    np.testing.assert_allclose(c1.extinction, c0.extinction, rtol=1e-6)
    np.testing.assert_allclose(c1.single_scattering_albedo,
                               c0.single_scattering_albedo, rtol=1e-6)
    np.testing.assert_array_equal(c1.phase_function_index, c0.phase_function_index)


def test_domain_roundtrip_partial_and_uniform(tmp_path):
    """Multi-component: 3D sub-range component + horizontally uniform component."""
    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.5, 8))], key=[1.0])
    dom = make_step_cloud(1.0)
    # Rayleigh-like uniform component over a z sub-range
    ray_ext = np.full(8, 1e-4)
    dom = dom.add_component("rayleigh", ray_ext, np.ones(8),
                            np.zeros(8, np.int32), table, z_level_base=16)
    path = str(tmp_path / "multi.opt")
    write_domain(dom, path)
    back = read_domain(path)
    assert len(back.components) == 2
    c = back.components[1]
    assert c.horizontally_uniform
    assert c.z_level_base == 16
    assert c.n_layers == 8
    np.testing.assert_allclose(c.extinction[0, 0], ray_ext, rtol=1e-6)


def test_step_cloud_structure():
    dom = make_step_cloud(1.0)
    assert dom.grid_shape == (32, 1, 32)
    ext = dom.components[0].extinction
    np.testing.assert_allclose(ext[:16] * 250.0 / 32, 2.0 / 32)
    np.testing.assert_allclose(ext[16:] * 250.0 / 32, 18.0 / 32)


def test_radar_cloud_structure():
    dom = make_radar_cloud("hg", 1.0)
    assert dom.grid_shape == (640, 1, 54)
    tau = dom.components[0].extinction.sum(axis=2)[:, 0] * 45.0
    assert tau.max() > 10.0  # thick cloud present
    assert (tau >= 0).all()
    # C1 tabulated variant loads and normalizes
    dom_c1 = make_radar_cloud("c1", 0.99)
    pf = dom_c1.components[0].table.phase_functions[0]
    mus = np.cos(np.linspace(0, np.pi, 2001))
    vals = pf.values(np.linspace(0, np.pi, 2001))
    np.testing.assert_allclose(-np.trapezoid(vals, mus), 2.0, rtol=1e-3)
    # Legendre variant: asymmetry parameter of C1 around 0.85
    g1 = make_radar_cloud("c1_legendre", 1.0).components[0].table.phase_functions[0]
    assert 0.8 < g1.legendre_coefficients[0] < 0.9


def test_landsat_cloud_structure():
    dom = make_landsat_cloud(1.0)
    assert dom.grid_shape == (128, 128, 119)
    comp = dom.components[0]
    # Column optical depth rebuilt from extinction matches the input field
    # (the generator's own internal consistency oracle, i3rcLandsatCloud.f95:111-116).
    from i3rc_tpu.models.landsat_cloud import _read_fixed, DATA_DIR
    import os
    tau_in = _read_fixed(os.path.join(DATA_DIR, "scene43.tau.128x128"))
    tau_out = comp.extinction.sum(axis=2) * 20.0
    np.testing.assert_allclose(tau_out, tau_in, atol=2e-5)


def test_slab_domain_variants():
    d1 = make_slab_domain(2.0, 0.9, use_moments=True)
    d2 = make_slab_domain(2.0, 0.9, use_moments=False, n_angles=2001)
    for d in (d1, d2):
        assert d.grid_shape == (1, 1, 1)
        np.testing.assert_allclose(d.components[0].extinction, 2.0 / 250.0)
    # the two phase-function representations agree away from the peak
    a = np.linspace(0.3, np.pi, 50)
    v1 = d1.components[0].table.phase_functions[0].values(a)
    v2 = d2.components[0].table.phase_functions[0].values(a)
    np.testing.assert_allclose(v1, v2, rtol=5e-2)  # 64-moment truncation ripple


def test_step_cloud_files_written(tmp_path):
    paths = write_step_domains(str(tmp_path))
    assert len(paths) == 2
    back = read_domain(paths[1])
    assert back.components[0].single_scattering_albedo.max() == pytest.approx(0.99)

"""L4 tool tests: Mie machinery, refractive indices, property converters."""

import numpy as np
import pytest

from i3rc_tpu.tools.mie import (
    get_center_wavelength,
    make_mie_table,
    mie_coefficients,
    mie_cross_sections,
    mie_one,
)
from i3rc_tpu.tools.refractive_index import refice, refwat


def test_refractive_index_literature_values():
    # Hale & Querry (1972): n(0.5 um) = 1.335, k = 1.0e-9
    n, k = refwat(0.5)
    assert n[0] == pytest.approx(1.335, abs=1e-3)
    assert k[0] == pytest.approx(1.0e-9, rel=0.1)
    # Warren (1984) ice in the visible
    n_i, k_i = refice(0.5)
    assert n_i[0] == pytest.approx(1.313, abs=2e-3)
    assert k_i[0] < 1e-8
    # Strong water absorption near 3 um
    _, k3 = refwat(3.0)
    assert k3[0] > 0.1
    # Microwave Debye region at 1 cm / 283 K: eps ~ 18 - 27i -> n ~ 4.9, k ~ 2.8
    n_mw, k_mw = refwat(10000.0, 283.0)
    assert 4.0 < n_mw[0] < 6.0
    assert 2.0 < k_mw[0] < 3.5
    # Ice microwave region with temperature dependence
    n_ice_mw, _ = refice(1000.0, 253.0)
    assert 1.7 < n_ice_mw[0] < 1.9


def test_mie_wiscombe_nonabsorbing():
    """Wiscombe (1980) MIEV0 case: m=1.5, x=10 -> Qext = Qsca = 2.8820."""
    a, b = mie_coefficients(10.0, 1.5 + 0j)
    qext, qsca = mie_cross_sections(10.0, a, b)
    assert qext == pytest.approx(2.8820, abs=2e-4)
    assert qsca == pytest.approx(qext, rel=1e-10)  # conservative


def test_mie_absorbing_positive_absorption():
    a, b = mie_coefficients(10.0, 1.5 - 1.0j)
    qext, qsca = mie_cross_sections(10.0, a, b)
    assert qext > qsca > 0  # absorbing sphere


def test_mie_one_normalized_legendre():
    ext, sca, n_leg, leg = mie_one(0.67, 1.331 - 1.64e-8j, 5.0, 300)
    assert ext == pytest.approx(sca, rel=1e-4)  # nearly conservative
    assert leg[0] / sca == pytest.approx(1.0, abs=1e-5)  # P0 == 1
    g = leg[1] / sca / 3.0
    assert 0.7 < g < 0.9  # water droplet asymmetry
    # geometric-optics limit: Qext -> ~2.1 at x = 47
    assert ext / (np.pi * 25.0) == pytest.approx(2.2, abs=0.2)


def test_make_mie_table_water():
    table = make_mie_table(0.67, particle_type="W", alpha=7.0, n_retab=3,
                           s_retab=5.0, e_retab=15.0, max_radius=40.0)
    assert table.n_entries == 3
    np.testing.assert_allclose(table.key, [5.0, 10.0, 15.0])
    ext = table.extinctions
    # extinction per g/m^3 scales as ~1/reff (ext = 3 Q / (4 rho reff))
    assert ext[0] / ext[1] == pytest.approx(2.0, rel=0.1)
    assert np.all(table.single_scattering_albedos > 0.999)  # visible: conservative
    # asymmetry factor of water clouds ~0.85
    g = table.phase_functions[1].legendre_coefficients[0]
    assert 0.8 < g < 0.9


def test_make_mie_table_absorbing_wavelength():
    table = make_mie_table(2.13, particle_type="W", alpha=7.0, n_retab=1,
                           s_retab=8.0, max_radius=30.0)
    ssa = table.phase_functions[0].single_scattering_albedo
    assert 0.95 < ssa < 0.999  # 2.13 um: weakly absorbing


def test_center_wavelength_planck_weighting():
    assert get_center_wavelength(0.5, 0.5) == 0.5
    c = get_center_wavelength(0.4, 0.8)
    assert 0.4 < c < 0.8


def test_physical_to_domain_pipeline(tmp_path):
    from i3rc_tpu.io.netcdf import write_phase_function_table
    from i3rc_tpu.tools.physical_to_domain import physical_properties_to_domain

    table = make_mie_table(0.67, particle_type="W", alpha=7.0, n_retab=4,
                           s_retab=2.0, e_retab=20.0, max_radius=50.0)
    # 2-parameter LWC file, 2x1x2 cells
    lwc = tmp_path / "tiny.lwc"
    lwc.write_text(
        "2 parameter LWC\n"
        "2 1 2\n"
        "0.1 0.1\n"
        "0.5 0.6 0.7\n"
        "285.0 284.0 283.0\n"
        "1 1 1 0.3 10.0\n"
        "2 1 1 0.2 8.0\n"
        "1 1 2 0.1 6.0\n")
    dom = physical_properties_to_domain(
        str(lwc), [table], other_heights=[0.0, 1.0], other_temps=[288.0, 282.0],
        rayleigh_wavelength=0.67)
    assert dom.grid_shape == (2, 1, 4)  # 2 particle + 2 extra layers
    names = dom.component_names
    assert names == ("Particle type 1", "Rayleigh scattering")
    cloud = dom.components[0]
    assert cloud.z_level_base == 1
    # extinction = mass * table extinction interpolated at reff
    keys, exts = table.key, table.extinctions
    expected = 0.3 * np.interp(10.0, keys, exts)
    assert cloud.extinction[0, 0, 0] == pytest.approx(expected, rel=1e-4)
    rayl = dom.components[1]
    assert rayl.horizontally_uniform and rayl.n_layers == 4
    assert np.all(rayl.extinction > 0)
    # round-trip through the domain file
    from i3rc_tpu.io.netcdf import read_domain, write_domain
    path = str(tmp_path / "tiny.dom")
    write_domain(dom, path)
    back = read_domain(path)
    assert back.component_names == names


def test_optical_to_domain_les_example():
    from i3rc_tpu.tools.optical_to_domain import optical_properties_to_domain

    dom = optical_properties_to_domain("examples/tools/les_stcu_w213.prp")
    assert dom.grid_shape == (64, 64, 18)
    comp = dom.components[0]
    assert comp.table.n_entries == 27
    assert comp.extinction.max() > 10.0
    assert np.all((comp.single_scattering_albedo >= 0)
                  & (comp.single_scattering_albedo <= 1))


def test_namelist_complex_literal():
    from i3rc_tpu.utils.namelist import parse_namelist

    g = parse_namelist("&x\n rindex=(1.45,-0.01), a = 3\n/")
    assert g["x"]["rindex"] == complex(1.45, -0.01)

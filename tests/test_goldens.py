"""Frozen on-disk-format goldens: the Fortran-interop layout contract.

The files in tests/goldens/ were generated ONCE by scripts/make_goldens.py,
typed line-by-line from the reference's netCDF writers (opticalProperties
.f95:554-716, scatteringPhaseFunctions.f95:899-1070, monteCarloDriver.f95:
609-854) — independently of i3rc_tpu.io — and committed.  Two gates:

  1. READ gates: the package readers must reconstruct the goldens' axis-
     asymmetric value patterns (v = ix + 10*iy + 100*iz).  A transposed or
     renamed reader cannot pass — this is what self-roundtrip tests miss.
  2. STRUCTURE gates: files freshly written by the package must carry
     exactly the golden's variable names, per-variable CDL dimension
     tuples, dtypes, and attribute names.  Any silent rename or dim
     reorder that would break the Fortran reader fails CI here.
"""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from i3rc_tpu.io.netcdf import (
    read_domain,
    read_phase_function_table,
    write_domain,
    write_phase_function_table,
)

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
NX, NY, NZ = 3, 2, 4


def _pattern():
    ix, iy, iz = np.meshgrid(np.arange(NX), np.arange(NY), np.arange(NZ),
                             indexing="ij")
    return 1.0 + ix + 10.0 * iy + 100.0 * iz


def _structure(path):
    """{var: (dims, dtype-kind)} + sorted attribute names of a netCDF file."""
    with netcdf_file(path, "r", mmap=False) as nc:
        svars = {name: (v.dimensions, np.dtype(v.typecode()).kind)
                 for name, v in nc.variables.items()}
        atts = sorted(k for k in nc._attributes)
    return svars, atts


def test_golden_domain_reads_correctly():
    dom = read_domain(os.path.join(GOLD, "golden_domain.dom"))
    assert [c.name for c in dom.components] == ["golden cloud", "golden gas"]
    c1, c2 = dom.components
    pat = _pattern()
    # Orientation gate: the asymmetric pattern must land (x, y, z).
    np.testing.assert_allclose(c1.extinction, 0.01 * pat, rtol=1e-6)
    np.testing.assert_allclose(c1.single_scattering_albedo, 1.0 / pat,
                               rtol=1e-6)
    np.testing.assert_array_equal(c1.phase_function_index,
                                  np.where(pat % 2 == 0, 1, 0))  # 0-based
    # Embedded Angle-Value table: CDL (entry, angle) -> values per entry.
    # The reader renormalizes to integral P dmu == 2 (the reference's
    # constructor does the same), so the gate is PROPORTIONALITY to the
    # asymmetric pattern — a transposed read can't be proportional.
    vals0 = np.asarray(c1.table.phase_functions[0].value)
    vals1 = np.asarray(c1.table.phase_functions[1].value)
    r0 = vals0 / (1.0 + 10.0 * np.arange(5))
    r1 = vals1 / (2.0 + 10.0 * np.arange(5))
    np.testing.assert_allclose(r0, r0[0], rtol=1e-5)
    np.testing.assert_allclose(r1, r1[0], rtol=1e-5)
    # Horizontally uniform sub-range component, zLevelBase 1-based on file.
    assert c2.z_level_base == 1 and c2.n_layers == 2
    assert c2.horizontally_uniform
    np.testing.assert_allclose(c2.extinction[0, 0], [3e-4, 4e-4], rtol=1e-6)
    lc = c2.table.phase_functions[0].legendre_coefficients
    np.testing.assert_allclose(lc, [0.85, 0.7225, 0.614125], rtol=1e-6)


def test_golden_tables_read_correctly():
    t_leg = read_phase_function_table(
        os.path.join(GOLD, "golden_table_legendre.pft"))
    assert t_leg.n_entries == 2
    np.testing.assert_allclose(
        t_leg.phase_functions[1].legendre_coefficients, [0.5, 0.25], rtol=1e-6)
    t_ang = read_phase_function_table(
        os.path.join(GOLD, "golden_table_angles.pft"))
    np.testing.assert_allclose(np.asarray(t_ang.key), [5.0, 10.0])
    # Proportional to the pattern after the reader's renormalization.
    r0 = np.asarray(t_ang.phase_functions[0].value) \
        / (1.0 + 10.0 * np.arange(5))
    np.testing.assert_allclose(r0, r0[0], rtol=1e-5)


def _golden_equivalent_domain():
    from i3rc_tpu.core.optics import Domain
    from i3rc_tpu.core.phase_functions import PhaseFunction, PhaseFunctionTable

    pat = _pattern()
    angles = np.linspace(0.0, np.pi, 5)
    t_ang = PhaseFunctionTable.from_tabulated(
        angles, np.stack([1.0 + 10.0 * np.arange(5),
                          2.0 + 10.0 * np.arange(5)], axis=1),
        [5.0, 10.0], [0.1, 0.2], [0.9, 1.0],
        description="golden angle-value table")
    t_leg = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre([0.85, 0.7225, 0.614125]),
         PhaseFunction.from_legendre([0.5, 0.25])], key=[1.0, 2.0])
    dom = Domain.create(np.linspace(0, 300.0, NX + 1),
                        np.linspace(0, 200.0, NY + 1),
                        np.linspace(0, 400.0, NZ + 1))
    dom = dom.add_component("golden cloud", 0.01 * pat, 1.0 / pat,
                            np.where(pat % 2 == 0, 1, 0).astype(np.int32),
                            t_ang)
    return dom.add_component(
        "golden gas", np.float64([3e-4, 4e-4]), np.zeros(2),
        np.zeros(2, np.int32), t_leg, z_level_base=1)


def test_written_domain_structure_matches_golden(tmp_path):
    """Freshly written files carry EXACTLY the Fortran reader's layout."""
    out = str(tmp_path / "own.dom")
    write_domain(_golden_equivalent_domain(), out)
    own_vars, own_atts = _structure(out)
    gold_vars, gold_atts = _structure(os.path.join(GOLD, "golden_domain.dom"))
    assert own_vars == gold_vars
    assert own_atts == gold_atts


def test_written_table_structure_matches_golden(tmp_path):
    from i3rc_tpu.core.phase_functions import PhaseFunction, PhaseFunctionTable

    out = str(tmp_path / "own.pft")
    write_phase_function_table(PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre([0.85, 0.7225, 0.614125]),
         PhaseFunction.from_legendre([0.5, 0.25])], key=[1.0, 2.0]), out)
    own_vars, own_atts = _structure(out)
    gold_vars, gold_atts = _structure(
        os.path.join(GOLD, "golden_table_legendre.pft"))
    assert own_vars == gold_vars
    # The golden carries no description; ours may not invent one either.
    assert own_atts == gold_atts


def test_written_results_structure_matches_golden(tmp_path):
    from i3rc_tpu.drivers.results_io import write_results_netcdf

    pat = _pattern()
    ix, iy = np.meshgrid(np.arange(NX), np.arange(NY), indexing="ij")
    f_xy = 1.0 + ix + 10.0 * iy
    ixd, iyd, idd = np.meshgrid(np.arange(NX), np.arange(NY), np.arange(2),
                                indexing="ij")
    inten = 1.0 + ixd + 10.0 * iyd + 100.0 * idd
    cfg = dict(domain_file="d", surface_albedo=0.3, num_photons=1000,
               num_batches=4, solar_flux=1.0, solar_mu=0.5, solar_azimuth=0.0,
               seed=7, n_phase_intervals=9001, use_ray_tracing=False,
               use_hybrid=False, hybrid_width=0.0, use_rr_intensity=False,
               zeta_min=0.0, limit_intensity=False, max_intensity=0.0,
               time_total=1.5, time_setup=0.1, n_devices=8)
    out = str(tmp_path / "own_results.nc")
    write_results_netcdf(
        out, cfg,
        np.linspace(0, 300.0, NX + 1), np.linspace(0, 200.0, NY + 1),
        np.linspace(0, 400.0, NZ + 1),
        (f_xy, 0.01 * f_xy), (f_xy, 0.01 * f_xy), (f_xy, 0.01 * f_xy),
        absorption_profile=(np.arange(1.0, 5.0), 0.1 * np.arange(1.0, 5.0)),
        absorbed_volume=(pat, 0.01 * pat),
        intensity=(inten, 0.01 * inten),
        intensity_mus=[1.0, -0.5], intensity_phis=[0.0, 45.0])
    own_vars, _ = _structure(out)
    gold_vars, gold_atts = _structure(os.path.join(GOLD, "golden_results.nc"))
    assert own_vars == gold_vars
    # Attributes: every name the golden pins must be present (the package
    # records MORE config attrs than the minimal golden — that is fine for
    # the Fortran reader, which looks attributes up by name).
    with netcdf_file(out, "r", mmap=False) as nc:
        own_atts = set(nc._attributes)
    assert set(gold_atts) <= own_atts
    # Value-orientation gate: fluxUp on disk is CDL (y, x); intensity is
    # (direction, y, x) (monteCarloDriver.f95:724-768).
    with netcdf_file(out, "r", mmap=False) as nc:
        np.testing.assert_allclose(np.array(nc.variables["fluxUp"][...]),
                                   f_xy.T, rtol=1e-6)
        np.testing.assert_allclose(np.array(nc.variables["intensity"][...]),
                                   inten.T, rtol=1e-6)
        np.testing.assert_allclose(
            np.array(nc.variables["absorbedVolume"][...]), pat.T, rtol=1e-6)


def test_golden_results_layout_pinned():
    """The golden itself: per-variable CDL dims exactly as the Fortran
    declares them (reversed), catching accidental golden regeneration."""
    gold_vars, _ = _structure(os.path.join(GOLD, "golden_results.nc"))
    assert gold_vars["fluxUp"] == (("y", "x"), "f")
    assert gold_vars["absorbedVolume"] == (("z", "y", "x"), "f")
    assert gold_vars["intensity"] == (("direction", "y", "x"), "f")
    gold_vars, _ = _structure(os.path.join(GOLD, "golden_domain.dom"))
    assert gold_vars["Component1_Extinction"] == \
        (("z-Grid", "y-Grid", "x-Grid"), "f")
    assert gold_vars["Component1_PhaseFunctionIndex"][1] == "i"  # int16
    assert gold_vars["Component1_phaseFunctionValues"] == \
        (("Component1_phaseFunctionNumber", "Component1_scatteringAngle"),
         "f")

"""Driver (L3) tests: namelist-configured end-to-end runs with file outputs."""

import os
import textwrap

import numpy as np
import pytest
from scipy.io import netcdf_file

from i3rc_tpu.drivers.monte_carlo_driver import run_from_namelist as run_mcd
from i3rc_tpu.drivers.plane_parallel import run_from_namelist as run_pp


def test_plane_parallel_reference_namelist():
    """The reference's shipped planeParallel.nml runs unmodified."""
    path = "/root/reference/Example-Drivers/planeParallel.nml"
    if not os.path.exists(path):
        path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "planeParallel.nml")
    out = run_pp(path, quiet=True)
    # tau=1, conservative: energy closure and sane reflectance
    assert out["flux_up"] + out["flux_down"] == pytest.approx(1.0, abs=2e-3)
    assert 0.12 < out["flux_up"] < 0.21
    assert out["flux_up_err"] < 0.02


def test_monte_carlo_driver_flux_outputs(tmp_path):
    from i3rc_tpu.models.step_cloud import write_domains

    write_domains(str(tmp_path))
    nml = textwrap.dedent(f"""
    &radiativeTransfer
      solarFlux = 2., solarMu = 0.5, solarAzimuth = 0., surfaceAlbedo = 0.3,
    /
    &monteCarlo
      numPhotonsPerBatch = 5000, numBatches = 4, iseed = 7, nPhaseintervals = 10001
    /
    &algorithms
      useRayTracing = .false., useRussianRoulette = .true.,
    /
    &fileNames
      domainFileName = "{tmp_path}/StepCloud_Absorbing.opt",
      outputFluxFile = "{tmp_path}/fluxes.out",
      outputAbsProfFile = "{tmp_path}/absprof.out",
      outputNetcdfFile = "{tmp_path}/out.nc"
    /
    &output
      reportAbsorptionProfile = .true., reportVolumeAbsorption = .true.
    /
    """)
    nml_path = tmp_path / "mc.nml"
    nml_path.write_text(nml)
    out = run_mcd(str(nml_path), quiet=True)

    # Files written
    assert (tmp_path / "fluxes.out").exists()
    assert (tmp_path / "absprof.out").exists()
    assert (tmp_path / "out.nc").exists()

    # Header contract: batches round up to the 8-device mesh (4 -> 8), the
    # reference's numBatches/numProcs rounding (monteCarloDriver.f95:268-271)
    assert out["cfg"]["num_batches"] == 8
    header = (tmp_path / "fluxes.out").read_text().splitlines()
    assert header[0].startswith("!   I3RC Monte Carlo")
    assert any(f"Num_Photons={out['cfg']['num_photons']:>10d}" in l for l in header)

    # solarFlux scaling: fluxes scale by 2 -> closure sums to 2
    m = out["mean_stats"]
    total = m[0][0] + 0.7 * m[1][0] + m[2][0]
    assert total == pytest.approx(2.0, rel=5e-3)

    # netCDF result file structure.  On-disk CDL order is the REVERSE of
    # the reference's Fortran declaration (/x, y/): fluxUp(y, x)
    # (monteCarloDriver.f95:724-725; see drivers/results_io.py).
    with netcdf_file(str(tmp_path / "out.nc"), "r", mmap=False) as nc:
        assert nc.variables["fluxUp"].shape == (1, 32)
        assert nc.variables["fluxUp"].dimensions == ("y", "x")
        assert nc.variables["absorbedVolume"].dimensions == ("z", "y", "x")
        assert "fluxUp_StdErr" in nc.variables
        assert "absorptionProfile" in nc.variables
        assert nc.Algorithm == b"Max_cross_section"
        assert int(nc.Number_of_batches) == 8
        np.testing.assert_allclose(np.array(nc.variables["fluxUp"][...]).T,
                                   out["flux_up"][0], rtol=1e-6)


def test_plane_parallel_radiance_mode(tmp_path):
    nml = textwrap.dedent("""
    &radiativeTransfer
      solarMu = 0.6, solarAzimuth = 0., surfaceAlbedo = 0.0,
      intensityMus = 0.8, intensityPhis = 0.
    /
    &monteCarlo
      numPhotonsPerBatch = 5000, numBatches = 2, iseed = 3, nPhaseintervals = 10000
    /
    &algorithms
      useRayTracing = T, useRussianRoulette = T,
      useRussianRouletteForIntensity = F, zetaMin = 0.,
    /
    &filenames
      domainFileName = "",
    /
    &problemOptics
      SSA = 1., opticalDepth = 0.5, g = 0.85, useMoments = T,
      nLegendreCoefficients = 64,
    /
    &problemDomain
      nX = 1, nY = 1, domainSize = 500., nLayers = 1, physicalThickness = 250.,
    /
    """)
    p = tmp_path / "pp.nml"
    p.write_text(nml)
    out = run_pp(str(p), quiet=True)
    assert out["radiance"].shape == (1,)
    assert 0.0 < float(out["radiance"][0]) < 0.2


def test_broadband_driver(tmp_path):
    """Broadband driver end-to-end: domain + two k-distribution files in,
    broadband flux/radiance/profile files out.  The near-transparent-cloud
    scene makes the broadband transmission closed-form:
    T = sum_b f_b sum_k w_bk exp(-tau_bk / mu0)."""
    from i3rc_tpu import Domain
    from i3rc_tpu.core.k_distribution import KDistribution, write_k_distribution
    from i3rc_tpu.core.phase_functions import (
        PhaseFunction,
        PhaseFunctionTable,
        henyey_greenstein_coefficients,
    )
    from i3rc_tpu.drivers.broadband_driver import run_from_namelist as run_bb
    from i3rc_tpu.io.netcdf import write_domain

    table = PhaseFunctionTable.from_phase_functions(
        [PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.85, 16))],
        key=[1.0])
    dom = Domain.create([0, 1.0], [0, 1.0], np.linspace(0, 1.0, 5))
    ext = np.full((1, 1, 4), 1e-3)
    dom = dom.add_component("cloud", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), table)
    write_domain(dom, str(tmp_path / "slab.dom"))
    z = np.linspace(0.0, 1.0, 5)
    taus = {0: np.array([0.2, 2.0]), 1: np.array([0.05, 0.8])}
    weights = {0: np.array([0.6, 0.4]), 1: np.array([0.5, 0.5])}
    fractions = {0: 0.7, 1: 0.3}
    for b in (0, 1):
        kd = KDistribution.create(
            z, np.broadcast_to(taus[b][None, :], (4, 2)).copy(), weights[b],
            wavelength_limits=(0.5 + b, 0.7 + b),
            spectral_fraction=fractions[b])
        write_k_distribution(kd, str(tmp_path / f"band{b}.kd"))

    nml = textwrap.dedent(f"""
    &radiativeTransfer
      solarFlux = 1., solarMu = 0.5, solarAzimuth = 0.,
      intensityMus = 1.0, 0.5, intensityPhis = 0., 0.,
    /
    &monteCarlo
      numPhotonsPerBatch = 10000, numBatches = 2, iseed = 7
    /
    &algorithms
      useRayTracing = .false., maxEvents = 100
    /
    &fileNames
      domainFileName = "{tmp_path}/slab.dom",
      outputFluxFile = "{tmp_path}/bb_flux.out",
      outputRadFile = "{tmp_path}/bb_rad.out",
      outputAbsProfFile = "{tmp_path}/bb_prof.out",
      outputNetcdfFile = "{tmp_path}/bb.nc"
    /
    &output
      reportAbsorptionProfile = .true.
    /
    &spectral
      kDistributionFiles = "{tmp_path}/band0.kd", "{tmp_path}/band1.kd",
      spectralMode = "auto"
    /
    """)
    nml_path = tmp_path / "bb.nml"
    nml_path.write_text(nml)
    out = run_bb(str(nml_path), quiet=True)

    for f in ("bb_flux.out", "bb_rad.out", "bb_prof.out", "bb.nc"):
        assert (tmp_path / f).exists(), f

    mu0 = 0.5
    expected = sum(fractions[b] * np.sum(weights[b] * np.exp(-taus[b] / mu0))
                   for b in (0, 1))
    got = float(out["flux_down"][0].mean())
    assert got == pytest.approx(expected, rel=1e-2)
    # Closure across the spectrum; volume profile integrates to Fabs.
    m = out["mean_stats"]
    assert m[0][0] + m[1][0] + m[2][0] == pytest.approx(1.0, rel=1e-2)
    dz = 0.25
    assert float(out["profile"][0].sum()) * dz == pytest.approx(
        m[2][0], rel=1e-3)
    # Both bands reported with finite stderr, and the domain-mean StdErr is
    # the batch-derived statistic (NOT the rms of per-pixel stderrs, which
    # overstates it by ~sqrt(n_pixels) — the monteCarloDriver contract).
    assert len(out["bands"]) == 2
    for band in out["bands"]:
        se = float(np.asarray(band.stderr["results"].flux_down).mean())
        assert np.isfinite(se) and se > 0
        assert np.isfinite(
            float(np.asarray(band.stderr["derived"]["mean_flux_down"])))
    assert 0 < m[1][1] < 0.1    # domain-mean Fdn stderr, sane magnitude


def test_broadband_driver_namelist_validation(tmp_path):
    """Quick guard tier for the broadband driver: missing kDistributionFiles
    and bad spectralMode fail loudly before any compile."""
    from i3rc_tpu.drivers.broadband_driver import run_from_namelist as run_bb

    base = textwrap.dedent("""
    &radiativeTransfer
      solarMu = 0.5
    /
    &fileNames
      domainFileName = "nonexistent.dom"
    /
    """)
    p = tmp_path / "missing_kd.nml"
    p.write_text(base)
    with pytest.raises(ValueError, match="kDistributionFiles"):
        run_bb(str(p), quiet=True)
    p2 = tmp_path / "bad_mode.nml"
    p2.write_text(base + textwrap.dedent("""
    &spectral
      kDistributionFiles = "x.kd", spectralMode = "warp"
    /
    """))
    with pytest.raises(ValueError, match="spectralMode"):
        run_bb(str(p2), quiet=True)


def test_plane_parallel_stdin_fallback(tmp_path, monkeypatch, capsys):
    """With no CLI argument the driver prompts for the namelist path on
    stdin (getOneArgument's prompt fallback, userInterface_Unix.f95:70-99);
    empty input falls through to the usage error."""
    import io

    from i3rc_tpu.drivers import plane_parallel

    nml = tmp_path / "pp.nml"
    src = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "planeParallel.nml")
    text = open(src).read().replace("numPhotonsPerBatch = 10000",
                                    "numPhotonsPerBatch = 2000")
    nml.write_text(text)
    monkeypatch.setattr("sys.stdin", io.StringIO(f"{nml}\n"))
    assert plane_parallel.main([]) == 0
    captured = capsys.readouterr()
    assert "Enter the namelist file name:" in captured.out
    assert "Fup" in captured.out  # the reference's stdout table was printed

    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert plane_parallel.main([]) == 1

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

    # netCDF result file structure
    with netcdf_file(str(tmp_path / "out.nc"), "r", mmap=False) as nc:
        assert nc.variables["fluxUp"].shape == (32, 1)
        assert "fluxUp_StdErr" in nc.variables
        assert "absorptionProfile" in nc.variables
        assert "absorbedVolume" in nc.variables
        assert nc.Algorithm == b"Max_cross_section"
        assert int(nc.Number_of_batches) == 8
        np.testing.assert_allclose(np.array(nc.variables["fluxUp"][...]),
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

"""Generate the frozen on-disk-format goldens in tests/goldens/.

These files pin the EXACT netCDF layout the Fortran reference reads and
writes — dimension names, variable names and their on-disk (CDL) dimension
order, attribute names, dtypes, 1-based index conventions.  They are
written HERE with scipy.io.netcdf_file directly, typed line-by-line from
the reference sources (NOT through i3rc_tpu.io), so the package's own
readers/writers are tested AGAINST them rather than against themselves:

  * domain files:      opticalProperties.f95:554-716 (write_Domain)
  * phase tables:      scatteringPhaseFunctions.f95:899-1070
  * result files:      monteCarloDriver.f95:609-854 (writeResults_netcdf)

Crucial convention: the Fortran netCDF API lists dimensions FASTEST-
VARYING FIRST, so a variable declared (/xDim, yDim, zDim/) in the .f95 is
(z, y, x) in on-disk/CDL order.  Every multi-dim golden variable uses the
reversed (CDL) tuple.  Value patterns are axis-asymmetric
(v = ix + 10*iy + 100*iz) so a transposed reader CANNOT pass the tests.

Run from the repo root:  python scripts/make_goldens.py
(The outputs are committed; regeneration must be byte-stable.)
"""

import os

import numpy as np
from scipy.io import netcdf_file

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "goldens")

NX, NY, NZ = 3, 2, 4          # deliberately all-different extents
N_ENTRY, N_ANG = 2, 5


def domain_pattern():
    """Axis-asymmetric per-cell value: ix + 10*iy + 100*iz (+1 to avoid 0)."""
    ix, iy, iz = np.meshgrid(np.arange(NX), np.arange(NY), np.arange(NZ),
                             indexing="ij")
    return (1.0 + ix + 10.0 * iy + 100.0 * iz).astype(np.float32)


def add_legendre_table(nc, prefix):
    """scatteringPhaseFunctions.f95:1002-1053, Legendre branch."""
    nc.createDimension(prefix + "phaseFunctionNumber", N_ENTRY)
    e = (prefix + "phaseFunctionNumber",)
    nc.createVariable(prefix + "phaseFunctionKeyT", "f", e)[:] = [1.0, 2.0]
    nc.createVariable(prefix + "extinctionT", "f", e)[:] = [0.0, 0.0]
    nc.createVariable(prefix + "singleScatteringAlbedoT", "f", e)[:] = [0.0, 0.0]
    lengths = np.array([3, 2], np.int32)
    starts = np.array([1, 4], np.int32)          # 1-based (:1040-1041)
    nc.createDimension(prefix + "coefficents", int(lengths.sum()))  # sic
    nc.createVariable(prefix + "start", "i", e)[:] = starts
    nc.createVariable(prefix + "length", "i", e)[:] = lengths
    nc.createVariable(prefix + "legendreCoefficients", "f",
                      (prefix + "coefficents",))[:] = \
        np.array([0.85, 0.7225, 0.614125, 0.5, 0.25], np.float32)
    setattr(nc, prefix + "phaseFunctionStorageType", "LegendreCoefficients")


def add_angle_table(nc, prefix):
    """scatteringPhaseFunctions.f95:1002-1026, Angle-Value branch.

    phaseFunctionValues declared (/angleDim, entryDim/) in Fortran
    (:1023-1024) -> CDL (entry, angle); value pattern 1+entry+10*angle.
    """
    nc.createDimension(prefix + "phaseFunctionNumber", N_ENTRY)
    e = (prefix + "phaseFunctionNumber",)
    nc.createVariable(prefix + "phaseFunctionKeyT", "f", e)[:] = [5.0, 10.0]
    nc.createVariable(prefix + "extinctionT", "f", e)[:] = [0.1, 0.2]
    nc.createVariable(prefix + "singleScatteringAlbedoT", "f", e)[:] = [0.9, 1.0]
    nc.createDimension(prefix + "scatteringAngle", N_ANG)
    ang = np.linspace(0.0, np.pi, N_ANG).astype(np.float32)
    nc.createVariable(prefix + "scatteringAngle", "f",
                      (prefix + "scatteringAngle",))[:] = ang
    ie, ia = np.meshgrid(np.arange(N_ENTRY), np.arange(N_ANG), indexing="ij")
    vals = (1.0 + ie + 10.0 * ia).astype(np.float32)      # CDL (entry, angle)
    nc.createVariable(prefix + "phaseFunctionValues", "f",
                      (prefix + "phaseFunctionNumber",
                       prefix + "scatteringAngle"))[:] = vals
    setattr(nc, prefix + "phaseFunctionStorageType", "Angle-Value")
    setattr(nc, prefix + "description", "golden angle-value table")


def make_table_goldens():
    with netcdf_file(os.path.join(OUT, "golden_table_legendre.pft"), "w") as nc:
        add_legendre_table(nc, "")
    with netcdf_file(os.path.join(OUT, "golden_table_angles.pft"), "w") as nc:
        add_angle_table(nc, "")


def make_domain_golden():
    """opticalProperties.f95:554-716: 2 components — a full-grid 3-D one
    and a horizontally uniform sub-range one with zLevelBase."""
    with netcdf_file(os.path.join(OUT, "golden_domain.dom"), "w") as nc:
        xe = np.linspace(0.0, 300.0, NX + 1).astype(np.float32)
        ye = np.linspace(0.0, 200.0, NY + 1).astype(np.float32)
        ze = np.linspace(0.0, 400.0, NZ + 1).astype(np.float32)
        nc.createDimension("x-Edges", NX + 1)
        nc.createDimension("y-Edges", NY + 1)
        nc.createDimension("z-Edges", NZ + 1)
        nc.createDimension("x-Grid", NX)
        nc.createDimension("y-Grid", NY)
        nc.createDimension("z-Grid", NZ)
        nc.createVariable("x-Edges", "f", ("x-Edges",))[:] = xe
        nc.createVariable("y-Edges", "f", ("y-Edges",))[:] = ye
        nc.createVariable("z-Edges", "f", ("z-Edges",))[:] = ze
        nc.xyRegularlySpaced = np.int32(1)          # asInt(logical) (:593)
        nc.zRegularlySpaced = np.int32(1)
        nc.numberOfComponents = np.int32(2)

        # Component 1: full-grid 3-D cloud.  Fortran (/x, y, z/) -> CDL
        # (z-Grid, y-Grid, x-Grid) (:627-634).
        p = "Component1_"
        setattr(nc, p + "Name", "golden cloud")
        setattr(nc, p + "zLevelBase", np.int32(1))   # 1-based level
        pat = domain_pattern()                        # (x, y, z) in memory
        ext_cdl = (0.01 * pat).T                      # CDL (z, y, x)
        ssa_cdl = (1.0 / pat).T
        idx_cdl = np.where(pat % 2 == 0, 2, 1).astype(np.int16).T  # 1-based
        nc.createVariable(p + "Extinction", "f",
                          ("z-Grid", "y-Grid", "x-Grid"))[:] = ext_cdl
        nc.createVariable(p + "SingleScatteringAlbedo", "f",
                          ("z-Grid", "y-Grid", "x-Grid"))[:] = ssa_cdl
        nc.createVariable(p + "PhaseFunctionIndex", "h",
                          ("z-Grid", "y-Grid", "x-Grid"))[:] = idx_cdl
        add_angle_table(nc, p)

        # Component 2: horizontally uniform, 2 layers from zLevelBase 2
        # (:616-625 private z-Grid; :636-641 1-D variables).
        p = "Component2_"
        setattr(nc, p + "Name", "golden gas")
        setattr(nc, p + "zLevelBase", np.int32(2))
        nc.createDimension(p + "z-Grid", 2)
        nc.createVariable(p + "Extinction", "f",
                          (p + "z-Grid",))[:] = np.float32([3e-4, 4e-4])
        nc.createVariable(p + "SingleScatteringAlbedo", "f",
                          (p + "z-Grid",))[:] = np.float32([0.0, 0.0])
        nc.createVariable(p + "PhaseFunctionIndex", "h",
                          (p + "z-Grid",))[:] = np.int16([1, 1])
        add_legendre_table(nc, p)


def make_results_golden():
    """monteCarloDriver.f95:609-854.  fluxUp declared (/x, y/) -> CDL
    (y, x); absorbedVolume (/x, y, z/) -> CDL (z, y, x); intensity
    (/x, y, dir/) -> CDL (direction, y, x)."""
    ND = 2
    with netcdf_file(os.path.join(OUT, "golden_results.nc"), "w") as nc:
        nc.description = "golden result file (reference layout)"
        nc.Surface_albedo = np.float32(0.3)
        nc.Total_number_of_photons = np.int32(1000)
        nc.Number_of_batches = np.int32(4)
        nc.Solar_flux = np.float32(1.0)
        nc.Solar_mu = np.float32(0.5)
        nc.Solar_phi = np.float32(0.0)
        nc.Random_number_seed = np.int32(7)
        nc.Algorithm = "Max_cross_section"
        nc.Cpu_time_total = np.float32(1.5)
        nc.Cpu_time_setup = np.float32(0.1)
        nc.Number_of_processors_used = np.int32(8)
        nc.createDimension("x", NX)
        nc.createDimension("y", NY)
        nc.createDimension("z", NZ)
        nc.createDimension("direction", ND)
        nc.createVariable("x", "f", ("x",))[:] = np.float32([50, 150, 250])
        nc.createVariable("y", "f", ("y",))[:] = np.float32([50, 150])
        nc.createVariable("z", "f", ("z",))[:] = np.float32([50, 150, 250, 350])
        ix, iy = np.meshgrid(np.arange(NX), np.arange(NY), indexing="ij")
        f_xy = (1.0 + ix + 10.0 * iy).astype(np.float32)          # (x, y)
        for name in ("fluxUp", "fluxDown", "fluxAbsorbed"):
            nc.createVariable(name, "f", ("y", "x"))[:] = f_xy.T
            nc.createVariable(name + "_StdErr", "f", ("y", "x"))[:] = 0.01 * f_xy.T
        nc.createVariable("absorptionProfile", "f", ("z",))[:] = \
            np.float32([1, 2, 3, 4])
        nc.createVariable("absorptionProfile_StdErr", "f", ("z",))[:] = \
            np.float32([0.1, 0.2, 0.3, 0.4])
        vol = domain_pattern()                                     # (x, y, z)
        nc.createVariable("absorbedVolume", "f", ("z", "y", "x"))[:] = vol.T
        nc.createVariable("absorbedVolume_StdErr", "f",
                          ("z", "y", "x"))[:] = (0.01 * vol).T
        nc.createVariable("intensityMus", "f", ("direction",))[:] = \
            np.float32([1.0, -0.5])
        nc.createVariable("intensityPhis", "f", ("direction",))[:] = \
            np.float32([0.0, 45.0])
        ixd, iyd, idd = np.meshgrid(np.arange(NX), np.arange(NY),
                                    np.arange(ND), indexing="ij")
        inten = (1.0 + ixd + 10.0 * iyd + 100.0 * idd).astype(np.float32)
        nc.createVariable("intensity", "f", ("direction", "y", "x"))[:] = inten.T
        nc.createVariable("intensity_StdErr", "f",
                          ("direction", "y", "x"))[:] = (0.01 * inten).T


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    make_table_goldens()
    make_domain_golden()
    make_results_golden()
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)), "bytes")

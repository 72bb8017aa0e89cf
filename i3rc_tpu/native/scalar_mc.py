"""ctypes binding for the native scalar-MC validation oracle.

See scalar_mc.cc — an independent double-precision photon-serial Monte
Carlo (own RNG, own DDA, no shared code) used by the test suite to
cross-check the JAX kernels on the 2-D/3-D benchmark scenes at photon
counts the pure-Python oracle (tests/reference_mc.py) cannot reach.
Built by scripts/build_native.sh; ``available()`` gates the tests.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "_scalar_mc.so")
_lib = None
if os.path.exists(_SO_PATH):
    try:
        _lib = ctypes.CDLL(_SO_PATH)
        _d = ctypes.POINTER(ctypes.c_double)
        _lib.trace_photons.restype = ctypes.c_longlong
        _lib.trace_photons.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            _d, _d, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            ctypes.c_longlong, ctypes.c_uint64,
            ctypes.c_double,
            _d, _d, _d]
        _lib.trace_photons_full.restype = ctypes.c_longlong
        _lib.trace_photons_full.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            _d, _d, ctypes.c_double,
            _d, _d, ctypes.c_int, _d,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int, _d, _d,
            ctypes.c_longlong, ctypes.c_uint64,
            ctypes.c_double,
            _d, _d, _d, _d]
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def trace(ext: np.ndarray, ssa: np.ndarray, g: float,
          x_edges, y_edges, z_edges,
          mu0: float, phi0: float, n_photons: int, seed: int = 1,
          surface_albedo: float = 0.0, roulette_threshold: float = 1e-3,
          phase_mu=None, phase_val=None,
          detector_mus=None, detector_phis=None):
    """Run the oracle; returns dict with per-column weight sums.

    ext/ssa: (nx, ny, nz) float64 C-order; regular grids only.
    ``phase_mu``/``phase_val`` (ascending mu, values) switch scattering from
    Henyey-Greenstein(g) to the tabulated phase function, sampled by exact
    piecewise-quadratic CDF inversion (scalar_mc.cc TabPhase).
    ``detector_mus``/``detector_phis`` (degrees) enable local-estimate
    radiances: the result gains "intensity" with per-(column, detector)
    weight sums at the trace exit columns — normalize like the framework
    (divide by photons per column and nothing else).
    """
    ext = np.ascontiguousarray(ext, dtype=np.float64)
    ssa = np.ascontiguousarray(ssa, dtype=np.float64)
    nx, ny, nz = ext.shape
    xe = np.asarray(x_edges, np.float64)
    ye = np.asarray(y_edges, np.float64)
    ze = np.asarray(z_edges, np.float64)
    up = np.zeros(nx * ny)
    dn = np.zeros(nx * ny)
    ab = np.zeros(nx * ny)
    d = ctypes.POINTER(ctypes.c_double)

    if phase_mu is not None:
        pf_mu = np.ascontiguousarray(phase_mu, np.float64)
        pf_val = np.ascontiguousarray(phase_val, np.float64)
        assert pf_mu.ndim == 1 and pf_mu.shape == pf_val.shape
        assert np.all(np.diff(pf_mu) > 0), "phase_mu must ascend"
        pf_n = pf_mu.size
        pf_scratch = np.zeros(pf_n)
    else:
        pf_mu = pf_val = pf_scratch = np.zeros(1)
        pf_n = 0

    if detector_mus is not None:
        mus = np.atleast_1d(np.asarray(detector_mus, np.float64))
        phis = np.deg2rad(np.atleast_1d(np.asarray(detector_phis, np.float64)))
        st = np.sqrt(np.maximum(1.0 - mus**2, 0.0))
        dirs = np.stack([st * np.cos(phis), st * np.sin(phis), mus],
                        axis=1)  # (D, 3)
        dirs = np.ascontiguousarray(dirs.ravel())
        absmu = np.ascontiguousarray(np.abs(mus))
        n_det = mus.size
        intensity = np.zeros(nx * ny * n_det)
    else:
        dirs = absmu = np.zeros(1)
        n_det = 0
        intensity = np.zeros(1)

    n_bad = _lib.trace_photons_full(
        nx, ny, nz,
        float(xe[0]), float(ye[0]), float(ze[0]),
        float(xe[1] - xe[0]), float(ye[1] - ye[0]), float(ze[1] - ze[0]),
        ext.ctypes.data_as(d), ssa.ctypes.data_as(d), float(g),
        pf_mu.ctypes.data_as(d), pf_val.ctypes.data_as(d), int(pf_n),
        pf_scratch.ctypes.data_as(d),
        float(mu0), float(np.deg2rad(phi0)), float(surface_albedo),
        int(n_det), dirs.ctypes.data_as(d), absmu.ctypes.data_as(d),
        int(n_photons), int(seed), float(roulette_threshold),
        up.ctypes.data_as(d), dn.ctypes.data_as(d), ab.ctypes.data_as(d),
        intensity.ctypes.data_as(d))
    out = {"flux_up": up, "flux_down": dn, "flux_absorbed": ab,
           "n_bad": int(n_bad), "n_photons": int(n_photons)}
    if n_det:
        out["intensity"] = intensity.reshape(nx * ny, n_det)
    return out

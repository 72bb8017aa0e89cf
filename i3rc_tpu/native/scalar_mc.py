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
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def trace(ext: np.ndarray, ssa: np.ndarray, g: float,
          x_edges, y_edges, z_edges,
          mu0: float, phi0: float, n_photons: int, seed: int = 1,
          surface_albedo: float = 0.0, roulette_threshold: float = 1e-3):
    """Run the oracle; returns dict with per-column weight sums.

    ext/ssa: (nx, ny, nz) float64 C-order; regular grids only.
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
    n_bad = _lib.trace_photons(
        nx, ny, nz,
        float(xe[0]), float(ye[0]), float(ze[0]),
        float(xe[1] - xe[0]), float(ye[1] - ye[0]), float(ze[1] - ze[0]),
        ext.ctypes.data_as(d), ssa.ctypes.data_as(d), float(g),
        float(mu0), float(np.deg2rad(phi0)), float(surface_albedo),
        int(n_photons), int(seed), float(roulette_threshold),
        up.ctypes.data_as(d), dn.ctypes.data_as(d), ab.ctypes.data_as(d))
    return {"flux_up": up, "flux_down": dn, "flux_absorbed": ab,
            "n_bad": int(n_bad), "n_photons": int(n_photons)}

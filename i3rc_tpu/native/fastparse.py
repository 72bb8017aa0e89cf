"""ctypes binding for the native ASCII number parser (+Python fallback).

See fastparse.cc.  The shared object is built by scripts/build_native.sh;
if absent (or the platform differs) a numpy-based fallback handles
everything, ~20-40x slower on LES-scale property files.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "_fastparse.so")
_lib = None
if os.path.exists(_SO_PATH):
    try:
        _lib = ctypes.CDLL(_SO_PATH)
        _lib.parse_float_tokens.restype = ctypes.c_longlong
        _lib.parse_float_tokens.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong]
        _lib.count_tokens.restype = ctypes.c_longlong
        _lib.count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
    except OSError:
        _lib = None


def native_available() -> bool:
    return _lib is not None


def _parse_python(text: str) -> np.ndarray:
    return np.array([float(t.replace("D", "e").replace("d", "e"))
                     for t in text.split()], dtype=np.float64)


def parse_float_tokens(text) -> np.ndarray:
    """All whitespace-separated numbers in text/bytes as a float64 array.

    Accepts Fortran D exponents.  Raises ValueError on non-numeric tokens.
    """
    if isinstance(text, str):
        data = text.encode()
    else:
        data = bytes(text)
    if _lib is None:
        return _parse_python(data.decode())
    n = len(data)
    max_out = _lib.count_tokens(data, n)
    out = np.empty(max_out, dtype=np.float64)
    got = _lib.parse_float_tokens(
        data, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out)
    if got < 0:
        offset = -int(got) - 1
        snippet = data[offset:offset + 16].decode(errors="replace")
        raise ValueError(f"parse_float_tokens: bad token at byte {offset}: "
                         f"{snippet!r}")
    return out[:got]

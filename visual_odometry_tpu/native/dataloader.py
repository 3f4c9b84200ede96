"""ctypes binding for the native dataset parser (vo_io.cpp).

Self-building: on first use, if ``libvo_io.so`` is absent and a C++
toolchain exists, it is compiled in place (a one-time ~1s cost). The pure
numpy path in ``utils/io.py`` remains the fallback, and both produce
identical arrays (tests/test_native_io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vo_io.cpp")
_LIB = os.path.join(_DIR, "libvo_io.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) and os.path.exists(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.vo_parse_table.restype = ctypes.c_long
        lib.vo_parse_table.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ]
        lib.vo_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_table(
    path: str, skiprows: int, first_col: int, n_cols: int
) -> Optional[np.ndarray]:
    """Parse a whitespace table -> (rows, n_cols) float64 array, or None."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    rows = lib.vo_parse_table(
        path.encode(), skiprows, first_col, n_cols, ctypes.byref(out)
    )
    if rows < 0:
        return None
    try:
        if rows == 0:
            return np.zeros((0, n_cols), np.float64)
        arr = np.ctypeslib.as_array(out, shape=(rows, n_cols)).copy()
    finally:
        if out:
            lib.vo_free(out)
    return arr

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
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                _SRC, "-o", _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _stale() -> bool:
    try:
        return os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    except OSError:
        return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.path.exists(_SRC) and (not os.path.exists(_LIB) or _stale()):
        if not _build() and not os.path.exists(_LIB):
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
        # Bind the whole-sequence loader only if this build exports it: a
        # stale-but-loadable library from before vo_load_sequence existed
        # (e.g. a failed rebuild leaving the old .so behind) must keep
        # serving vo_parse_table instead of disabling ALL native parsing.
        if hasattr(lib, "vo_load_sequence"):
            lib.vo_load_sequence.restype = ctypes.c_long
            lib.vo_load_sequence.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.vo_free_buf.argtypes = [ctypes.c_void_p]
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


def load_sequence_native(
    data_dir: str, n_slots: Optional[int], pad_appearance: float
):
    """Threaded native whole-sequence load -> padded arrays, or None.

    Returns (points (F,S,2) f32, apps (F,S,10) f32, ids (F,S) i32,
    mask (F,S) bool, counts (F,) i32) matching ``utils.io.pad_frames``
    exactly; the per-file parse + pad loop runs in C++ worker threads
    (the serial Python loop is the serving ingest bottleneck — one
    sequence costs ~25 ms there vs ~1-2 ms of device tracking).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "vo_load_sequence"):
        return None
    pts_p = ctypes.POINTER(ctypes.c_float)()
    apps_p = ctypes.POINTER(ctypes.c_float)()
    ids_p = ctypes.POINTER(ctypes.c_int)()
    mask_p = ctypes.POINTER(ctypes.c_ubyte)()
    counts_p = ctypes.POINTER(ctypes.c_int)()
    s_out = ctypes.c_int(0)
    f = lib.vo_load_sequence(
        data_dir.encode(),
        0 if n_slots is None else int(n_slots),
        ctypes.c_float(pad_appearance),
        ctypes.byref(pts_p),
        ctypes.byref(apps_p),
        ctypes.byref(ids_p),
        ctypes.byref(mask_p),
        ctypes.byref(counts_p),
        ctypes.byref(s_out),
    )
    if f <= 0:
        return None
    s = s_out.value
    try:
        points = np.ctypeslib.as_array(pts_p, shape=(f, s, 2)).copy()
        apps = np.ctypeslib.as_array(apps_p, shape=(f, s, 10)).copy()
        ids = np.ctypeslib.as_array(ids_p, shape=(f, s)).copy()
        mask = np.ctypeslib.as_array(mask_p, shape=(f, s)).astype(bool)
        counts = np.ctypeslib.as_array(counts_p, shape=(f,)).copy()
    finally:
        for p in (pts_p, apps_p, ids_p, counts_p):
            lib.vo_free_buf(p)
        lib.vo_free_buf(mask_p)
    return points, apps, ids, mask, counts

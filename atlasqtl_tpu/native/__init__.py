"""Native (C++) host-prep module: lazy g++ build + ctypes bindings.

Falls back silently to the NumPy implementations in io/prepare.py when no
compiler is available.  The shared object is cached next to the source and
rebuilt when the source changes.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastprep.cpp")
_lib = None
_tried = False


def _build_and_load():
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_fastprep_{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", _SRC, "-o", so_path + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so_path + ".tmp", so_path)
    lib = ctypes.CDLL(so_path)

    lib.fastprep_standardize.restype = ctypes.c_long
    lib.fastprep_standardize.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64)]
    lib.fastprep_columns_equal.restype = ctypes.c_int
    lib.fastprep_columns_equal.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long]
    lib.fastprep_missing_stats.restype = ctypes.c_long
    lib.fastprep_missing_stats.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_double)]
    return lib


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build_and_load()
        except Exception:
            _lib = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def standardize_and_hash(x):
    """In-place standardize (R scale() semantics) + constant flags + column
    hashes in one fused multithreaded pass.  x must be C-contiguous float64.
    Returns (is_constant bool (p,), hashes uint64 (p,)); constant columns are
    zero-filled."""
    lib = get_lib()
    assert lib is not None
    n, p = x.shape
    assert x.flags.c_contiguous and x.dtype == np.float64
    mean = np.empty(p)
    sd = np.empty(p)
    is_cst = np.empty(p, dtype=np.uint8)
    hashes = np.empty(p, dtype=np.uint64)
    lib.fastprep_standardize(
        _ptr(x, ctypes.c_double), n, p, _ptr(mean, ctypes.c_double),
        _ptr(sd, ctypes.c_double), _ptr(is_cst, ctypes.c_uint8),
        _ptr(hashes, ctypes.c_uint64))
    return is_cst.astype(bool), hashes


def columns_equal(x, j1, j2):
    lib = get_lib()
    n, p = x.shape
    return bool(lib.fastprep_columns_equal(_ptr(x, ctypes.c_double), n, p,
                                           int(j1), int(j2)))


def missing_stats(y):
    """(mask uint8 (n,q), col_obs (q,), col_mean (q,), total_obs)."""
    lib = get_lib()
    assert lib is not None
    n, q = y.shape
    y = np.ascontiguousarray(y, dtype=np.float64)
    mask = np.empty((n, q), dtype=np.uint8)
    col_obs = np.empty(q, dtype=np.int64)
    col_mean = np.empty(q)
    total = lib.fastprep_missing_stats(
        _ptr(y, ctypes.c_double), n, q, _ptr(mask, ctypes.c_uint8),
        _ptr(col_obs, ctypes.c_long), _ptr(col_mean, ctypes.c_double))
    return mask, col_obs, col_mean, int(total)

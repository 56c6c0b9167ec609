"""ctypes loader for the C++ host runtime (cxx/screen.cpp).

Compiles the shared library on first use with g++ -O3 (build products cached
under ~/.cache/qchem_rs_tpu). Falls back transparently to numpy when no
compiler is available, so the framework never hard-depends on the native
path — it just gets faster host-side setup for large systems.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "cxx" / "screen.cpp"
_CACHE = Path(os.environ.get("QCHEM_NATIVE_CACHE", Path.home() / ".cache" / "qchem_rs_tpu"))

_lib = None
_tried = False


def _build() -> ctypes.CDLL | None:
    if not _SRC.exists():
        return None
    _CACHE.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = _CACHE / f"screen_{tag}.so"
    if not so.exists():
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(so)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.screened_quartets_cxx.restype = ctypes.c_int64
    lib.screened_quartets_cxx.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_double,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


def _ptr_i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_f64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def screened_quartets_native(
    i_sh1: np.ndarray,
    j_sh1: np.ndarray,
    i_sh2: np.ndarray,
    j_sh2: np.ndarray,
    q1: np.ndarray,
    q2: np.ndarray,
    same_group: bool,
    threshold: float,
):
    """(br, kt, weight) for surviving quartets, or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    i_sh1 = np.ascontiguousarray(i_sh1, dtype=np.int64)
    j_sh1 = np.ascontiguousarray(j_sh1, dtype=np.int64)
    i_sh2 = np.ascontiguousarray(i_sh2, dtype=np.int64)
    j_sh2 = np.ascontiguousarray(j_sh2, dtype=np.int64)
    q1 = np.ascontiguousarray(q1, dtype=np.float64)
    q2 = np.ascontiguousarray(q2, dtype=np.float64)
    n1, n2 = len(q1), len(q2)
    null_i = ctypes.POINTER(ctypes.c_int64)()
    null_f = ctypes.POINTER(ctypes.c_double)()
    count = lib.screened_quartets_cxx(
        n1, n2, int(same_group),
        _ptr_i64(i_sh1), _ptr_i64(j_sh1), _ptr_i64(i_sh2), _ptr_i64(j_sh2),
        _ptr_f64(q1), _ptr_f64(q2), float(threshold), 0,
        null_i, null_i, null_f,
    )
    br = np.empty(count, dtype=np.int64)
    kt = np.empty(count, dtype=np.int64)
    w = np.empty(count, dtype=np.float64)
    lib.screened_quartets_cxx(
        n1, n2, int(same_group),
        _ptr_i64(i_sh1), _ptr_i64(j_sh1), _ptr_i64(i_sh2), _ptr_i64(j_sh2),
        _ptr_f64(q1), _ptr_f64(q2), float(threshold), 1,
        _ptr_i64(br), _ptr_i64(kt), _ptr_f64(w),
    )
    return br, kt, w

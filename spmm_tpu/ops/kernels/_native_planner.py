"""ctypes loader for the native routed-SpMV plan analyzer.

`native/spmv_planner.cpp` implements the bipartite edge coloring that
dominates `spmv_routed_plan`'s host cost (the analogue of cuSPARSE's
SpMV analysis phase, reference cusparse.py:1373-1438).  The sequential
Koenig construction there is guaranteed to succeed whenever the
per-node budgets cover the degrees — which `_color_groups` validates
before calling — and runs ~50-100x faster than the vectorised-numpy
greedy rounds (measured: 1M nnz colored in ~0.05 s vs 1-4 s).

The shared library is built by `native/build.sh`; if absent, we build
it lazily with g++ (atomic rename, so concurrent processes race
benignly).  Any failure degrades to the numpy path — behavior, not
availability, is the contract.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import warnings
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libspmv_planner.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "spmv_planner.cpp")
_CACHE_LIB_PATH = os.path.join(
    os.environ.get("XDG_CACHE_HOME",
                   os.path.join(os.path.expanduser("~"), ".cache")),
    "spmm_tpu", "libspmv_planner.so")

_lib = None
_tried = False


def _warn_degraded(reason: str) -> None:
    """One-time diagnostic when plan analysis falls back to numpy (10-40x
    slower at 1M+ nnz) — silent degradation is hard to debug (ADVICE r3)."""
    warnings.warn(
        f"spmm_tpu: native spmv planner unavailable ({reason}); plan "
        f"analysis falls back to the slower numpy path. Build it with "
        f"native/build.sh, or set SPMM_TPU_NO_NATIVE_PLANNER=1 to silence.",
        RuntimeWarning, stacklevel=3)


def _build_into(lib_path: str) -> bool:
    """Compile the planner into lib_path's directory via atomic rename
    (concurrent processes race benignly)."""
    tmp = None
    try:
        os.makedirs(os.path.dirname(lib_path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(suffix=".so",
                                   dir=os.path.dirname(lib_path))
        os.close(fd)
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             "-o", tmp, _SRC_PATH],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)
        return True
    except Exception:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except Exception:
                pass
        return False


def _build() -> Optional[str]:
    """Build lazily: prefer the package's native/ dir, fall back to the
    user cache dir on read-only installs. Returns the built path or None."""
    if not os.path.exists(_SRC_PATH):
        return None
    if _build_into(_LIB_PATH):
        return _LIB_PATH
    if _build_into(_CACHE_LIB_PATH):
        return _CACHE_LIB_PATH
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SPMM_TPU_NO_NATIVE_PLANNER"):
        return None
    lib_path = next((p for p in (_LIB_PATH, _CACHE_LIB_PATH)
                     if os.path.exists(p)), None) or _build()
    if lib_path is None:
        _warn_degraded("build failed or source missing")
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        fn = lib.spmm_color_edges
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        fn2 = lib.spmm_cumcount
        fn2.restype = ctypes.c_int64
        fn2.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception as exc:
        _warn_degraded(f"load failed: {exc}")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def color_edges(left: np.ndarray, right: np.ndarray,
                capV: np.ndarray) -> Optional[np.ndarray]:
    """Color edges (left[i], right[i]) under per-node budgets capV.

    Returns per-edge colors (int64, matching the numpy path's dtype) or
    None when the native library is unavailable or reports failure.
    """
    lib = _load()
    if lib is None:
        return None
    nnz = int(left.shape[0])
    lane = np.empty(nnz, np.int32)
    l32 = np.ascontiguousarray(left, np.int32)
    r32 = np.ascontiguousarray(right, np.int32)
    c32 = np.ascontiguousarray(capV, np.int32)
    rc = lib.spmm_color_edges(nnz, l32, r32, c32, int(capV.shape[0]),
                              lane)
    if rc != 0:
        return None
    return lane.astype(np.int64)


def cumcount(key: np.ndarray, nkeys: int) -> Optional[np.ndarray]:
    """seq[i] = #{j < i : key[j] == key[i]} in one O(nnz) native pass,
    or None when the library is unavailable (callers argsort instead).
    """
    lib = _load()
    if lib is None:
        return None
    k32 = np.ascontiguousarray(key, np.int32)
    seq = np.empty(k32.shape[0], np.int32)
    if lib.spmm_cumcount(int(k32.shape[0]), k32, int(nkeys), seq) != 0:
        return None
    return seq.astype(np.int64)

"""Native (C++) host-side cores, loaded through ctypes.

The compute path of this framework is JAX/XLA on TPU; these native cores
accelerate host-side graph algorithms that would otherwise dominate on
large catalogs.  Libraries are compiled on first use with g++ and cached
next to the sources; every native entry point has a pure-Python fallback so
the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build():
    src = os.path.join(_DIR, "fof.cpp")
    out = os.path.join(_DIR, "libnative.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """The native library handle, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        if os.environ.get("ORIGIN_TPU_NO_NATIVE"):
            return None
        try:
            lib = ctypes.CDLL(_build())
            lib.fof_merge_groups.restype = ctypes.c_int
            lib.fof_merge_groups.argtypes = [
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_double,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            logger.warning("native core unavailable (%s); using Python", exc)
    return _LIB


def fof_merge_groups(x, y, z, tol_spat, tol_spec):
    """Native friends-of-friends grouping; returns imatch or None."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    z = np.ascontiguousarray(z, dtype=np.float64)
    imatch = np.empty(len(x), dtype=np.int64)
    rc = lib.fof_merge_groups(
        x, y, z, len(x), float(tol_spat), float(tol_spec), imatch
    )
    if rc != 0:  # pragma: no cover
        return None
    return imatch

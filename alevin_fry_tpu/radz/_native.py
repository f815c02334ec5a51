"""ctypes bindings for the native RAD codec (csrc/radc.cpp).

The only inherently sequential part of RAD decoding is walking the
variable-length record boundaries (each record's size depends on its
``num_aln`` field).  That walk runs here in C++; everything else is
vectorized NumPy / JAX.  Falls back gracefully when the shared library
has not been built (build with ``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = Path(__file__).resolve().parent.parent.parent
    for cand in (here / "csrc" / "libradc.so", here / "libradc.so"):
        if cand.exists():
            return str(cand)
    env = os.environ.get("AFT_RADC_LIB")
    if env and os.path.exists(env):
        return env
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.radc_walk_records.restype = ctypes.c_int64
        lib.radc_walk_records.argtypes = [
            ctypes.c_void_p,  # buf
            ctypes.c_int64,  # buf_len
            ctypes.c_void_p,  # region_starts (int64*)
            ctypes.c_void_p,  # region_counts (int64*)
            ctypes.c_int64,  # n_regions
            ctypes.c_int64,  # read_bytes
            ctypes.c_int64,  # aln_bytes
            ctypes.c_void_p,  # out rec_starts (int64*)
            ctypes.c_void_p,  # out num_aln   (int64*)
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def walk_records(
    buf: np.ndarray,
    region_starts: np.ndarray,
    region_counts: np.ndarray,
    read_bytes: int,
    aln_bytes: int,
):
    lib = _load()
    total = int(region_counts.sum())
    rec_starts = np.empty(total, np.int64)
    num_aln = np.empty(total, np.int64)
    buf = np.ascontiguousarray(buf)
    region_starts = np.ascontiguousarray(region_starts, np.int64)
    region_counts = np.ascontiguousarray(region_counts, np.int64)
    rc = lib.radc_walk_records(
        buf.ctypes.data, buf.nbytes,
        region_starts.ctypes.data, region_counts.ctypes.data,
        len(region_starts), read_bytes, aln_bytes,
        rec_starts.ctypes.data, num_aln.ctypes.data,
    )
    if rc < 0:
        raise ValueError("record walk overran the buffer (corrupt RAD chunk?)")
    return rec_starts, num_aln

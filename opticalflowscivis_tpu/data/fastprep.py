"""ctypes binding for the native fused dataset-prep engine (csrc/fastprep.cpp).

The C++ library computes resample + flip-augment + tuple grouping in one
multithreaded pass, replacing ~6x of transient numpy copies.  Built on demand
(g++ is in the image; see csrc/build.sh); every call site falls back to the
numpy pipeline when the library is unavailable, and tests assert bit-equality
between the two paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_CSRC, "libfastprep.so"))
    if not os.path.exists(so):
        src = os.path.abspath(os.path.join(_CSRC, "fastprep.cpp"))
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             "-o", so, src],
            check=True,
        )
    lib = ctypes.CDLL(so)
    lib.fastprep_tuples.restype = ctypes.c_int64
    lib.fastprep_tuples.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.fastprep_count.restype = ctypes.c_int64
    lib.fastprep_count.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


def fastprep_available() -> bool:
    try:
        _load()
        return True
    except Exception:  # noqa: BLE001 — any build/load failure → numpy path
        return False


def prepare_tuples_native(
    data: np.ndarray,
    exp: int = 1,
    resample_stride: int = 3,
    flip_axes: int = 2,
    negate_flow: bool | None = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Fused resample+flip+group: ``[T, H, W, C] → [N, slots, H, W, C]``.

    Equivalent to ``group_tuples(flip_augment(temporal_resample(data)))`` for
    2-D data (the numpy path remains the oracle and rank-generic fallback).
    """
    data = np.ascontiguousarray(data, np.float32)
    t, h, w, c = data.shape
    ndim = 2
    if negate_flow is None:
        negate_flow = c == 1 + ndim
    lib = _load()
    n = int(lib.fastprep_count(t, flip_axes, exp))
    run = 2**exp + 1
    out = np.empty((n, run, h, w, c), np.float32)
    got = lib.fastprep_tuples(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, h, w, c, resample_stride, flip_axes, exp, int(negate_flow),
        n_threads,
    )
    if got != n:
        raise RuntimeError(f"fastprep returned {got}, expected {n}")
    return out

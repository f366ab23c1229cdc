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
        ctypes.c_int64,
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
    """Fused resample+flip+group: ``[T, *spatial, C] → [N, slots, *spatial, C]``.

    Equivalent to ``group_tuples(flip_augment(temporal_resample(data)))`` —
    the numpy path is the oracle and fallback.  Both 2-D ``[T, H, W, C]`` and
    3-D ``[T, Z, Y, X, C]`` are supported; flips always mirror the first two
    spatial axes (reference behaviour in both ranks).
    """
    data = np.ascontiguousarray(data, np.float32)
    ndim = data.ndim - 2
    c_real = data.shape[-1]
    if negate_flow is None:
        negate_flow = c_real == 1 + ndim
    t, a, b_axis = data.shape[0], data.shape[1], data.shape[2]
    inner = int(np.prod(data.shape[3:]))  # trailing spatial axes x channels
    lib = _load()
    n = int(lib.fastprep_count(t, flip_axes, exp))
    run = 2**exp + 1
    out = np.empty((n, run) + data.shape[1:], np.float32)
    got = lib.fastprep_tuples(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, a, b_axis, inner, c_real, resample_stride, flip_axes, exp,
        int(negate_flow), n_threads,
    )
    if got != n:
        raise RuntimeError(f"fastprep returned {got}, expected {n}")
    return out

"""ctypes wrapper + on-demand build for the native CPU re-ranker.

Compiled lazily with g++ (-O3 -fopenmp) into the package directory; falls
back gracefully (``native_available() == False``) when no toolchain exists.
The algorithm matches ops/reranking_numpy.py (the oracle) and the TPU
implementation — this is the CPU-deployment / large-scale-validation path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rerank.cpp")
_LIB = os.path.join(_DIR, "_rerank.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               _SRC, "-o", _LIB]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.rerank_kreciprocal.restype = ctypes.c_int
    lib.rerank_kreciprocal.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def re_ranking_native(
    qf: np.ndarray, gf: np.ndarray, k1: int = 20, k2: int = 6,
    lambda_value: float = 0.3,
) -> np.ndarray:
    """k-reciprocal re-ranking on CPU (multithreaded C++)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native rerank library unavailable (g++ build failed)")

    feat = np.concatenate([qf, gf], axis=0).astype(np.float32)
    num_q = qf.shape[0]
    n = feat.shape[0]
    sq = (feat**2).sum(1)
    orig = sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T
    orig = np.ascontiguousarray(
        np.transpose(orig / np.max(orig, axis=0)), dtype=np.float32
    )

    k1 = min(k1, n - 1)
    k2 = min(k2, n)
    out = np.empty((num_q, n - num_q), np.float32)
    rc = lib.rerank_kreciprocal(
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, num_q, k1, k2, ctypes.c_float(lambda_value),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"native rerank failed with code {rc}")
    return out

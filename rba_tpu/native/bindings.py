"""ctypes bindings for the native host library.

Native analogue of the reference's host C++ layer (SURVEY.md §2.1): exact
metric computation (replacing the sklearn sort hot spot) and the
Jonker–Volgenant assignment solver.  All entry points fall back to the
numpy/JAX implementations when the library has not been built.
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(os.path.abspath(__file__)), "librba_native.so")
    if not os.path.exists(so):
        try:
            from .build import build

            so = build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.rba_exact_ood_metrics.restype = ctypes.c_int
        lib.rba_exact_ood_metrics.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.rba_lsap.restype = ctypes.c_int
        lib.rba_lsap.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def exact_ood_metrics_native(scores: np.ndarray, labels: np.ndarray) -> Optional[Dict[str, float]]:
    """Native exact metrics; None when the library is unavailable or a class
    is empty (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    s = np.ascontiguousarray(scores.reshape(-1), np.float32)
    l = np.ascontiguousarray(labels.reshape(-1), np.int32)
    out = (ctypes.c_double * 3)()
    rc = lib.rba_exact_ood_metrics(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(s.size),
        out,
    )
    if rc != 0:
        return None
    return {"AUPRC": out[0], "AUROC": out[1], "FPR@95TPR": out[2]}


def lsap_native(cost: np.ndarray) -> Optional[np.ndarray]:
    """Exact LSAP via the native JV solver; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(cost, np.float64)
    nr, nc = c.shape
    out = np.empty((nr,), np.int32)
    rc = lib.rba_lsap(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(nr),
        ctypes.c_int32(nc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out

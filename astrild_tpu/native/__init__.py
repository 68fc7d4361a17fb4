"""ctypes bridge to the native C++ kernels (libastrild_native.so).

The library is built on demand with `make` (g++, OpenMP); all callers must
gracefully fall back to the JAX/numpy paths when the toolchain is absent —
`available()` reports the state. This mirrors the role of the reference's
lib_so_cgls C library and Cython pairwise kernels as CPU-side
counterparts/oracles of the device ops.
"""
from __future__ import annotations

import ctypes as ct
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "kappa_to_alphas", "kappa_to_phi",
           "pairwise_velocity", "read_f77_doubles"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libastrild_native.so")
_lib = None
_tried = False


def _load() -> Optional[ct.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ct.CDLL(_LIB_PATH)
    except OSError:
        return None
    dptr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.kappa0_to_alphas.argtypes = [dptr, ct.c_int, ct.c_double, dptr, dptr]
    lib.kappa0_to_phi.argtypes = [dptr, ct.c_int, ct.c_double, dptr]
    lib.pairwise_velocity_accumulate.argtypes = [
        dptr, dptr, ct.c_longlong, ct.c_double, ct.c_int, dptr, dptr]
    lib.read_f77_doubles.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
        ct.c_longlong, dptr, ct.c_longlong]
    lib.read_f77_doubles.restype = ct.c_longlong
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def kappa_to_alphas(kappa: np.ndarray, opening_angle: float
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Native C++ kappa -> (alpha1, alpha2); opening_angle in radians."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    kappa = np.ascontiguousarray(kappa, np.float64)
    n = kappa.shape[0]
    a1 = np.zeros((n, n))
    a2 = np.zeros((n, n))
    lib.kappa0_to_alphas(kappa, n, float(opening_angle), a1, a2)
    return a1, a2


def kappa_to_phi(kappa: np.ndarray, opening_angle: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    kappa = np.ascontiguousarray(kappa, np.float64)
    n = kappa.shape[0]
    phi = np.zeros((n, n))
    lib.kappa0_to_phi(kappa, n, float(opening_angle), phi)
    return phi


def pairwise_velocity(pos: np.ndarray, vel: np.ndarray, bins: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Native Yasini+18 pairwise estimator -> (rsep, v12)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pos = np.ascontiguousarray(pos, np.float64)
    vel = np.ascontiguousarray(vel, np.float64)
    binnr = len(bins)
    binwidth = float(bins[1] - bins[0])
    nom = np.zeros(binnr)
    den = np.zeros(binnr)
    lib.pairwise_velocity_accumulate(pos, vel, len(pos), binwidth, binnr,
                                     nom, den)
    with np.errstate(invalid="ignore", divide="ignore"):
        v12 = np.where(den > 0, nom / den, np.nan)
    rsep = np.linspace(0, (binnr - 1) * binwidth, binnr) + binwidth / 2
    return rsep, v12


def read_f77_doubles(buf: bytes, max_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.frombuffer(buf, np.uint8)
    out = np.zeros(max_out)
    n = lib.read_f77_doubles(np.ascontiguousarray(arr), len(arr), out,
                             max_out)
    if n < 0:
        raise IOError("F77 record marker mismatch")
    return out[:n]

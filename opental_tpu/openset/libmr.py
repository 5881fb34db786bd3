"""ctypes binding for the native libmr Weibull meta-recognition library.

Python API mirrors the reference Cython wrapper
(experiments/openmax/libMR/libmr.pyx:95-256): MR().fit_high(data, k),
w_score(x), w_score_vector(xs), cdf/inv, plus JSON (de)serialization in
place of the reference's string format.

The shared library builds on demand from native/libmr/libmr.cpp.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native', 'libmr')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libmr.so')
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mr_fit_high.restype = ctypes.c_int
    lib.mr_fit_high.argtypes = [dp, ctypes.c_int, ctypes.c_int,
                                ctypes.c_double, dp, dp, dp]
    lib.mr_w_score.restype = ctypes.c_double
    lib.mr_w_score.argtypes = [ctypes.c_double, ctypes.c_double,
                               ctypes.c_double, ctypes.c_double,
                               ctypes.c_double, ctypes.c_int]
    lib.mr_w_score_vector.restype = None
    lib.mr_w_score_vector.argtypes = [dp, ctypes.c_int, ctypes.c_double,
                                      ctypes.c_double, ctypes.c_double,
                                      ctypes.c_double, ctypes.c_int, dp]
    lib.mr_weibull_cdf.restype = ctypes.c_double
    lib.mr_weibull_cdf.argtypes = [ctypes.c_double, ctypes.c_double,
                                   ctypes.c_double]
    lib.mr_weibull_inv.restype = ctypes.c_double
    lib.mr_weibull_inv.argtypes = [ctypes.c_double, ctypes.c_double,
                                   ctypes.c_double]
    _lib = lib
    return lib


def _as_double_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class MR:
    """Weibull tail model (reference MR class parity)."""

    def __init__(self, fitting_size: int = 9,
                 translate_amount: float = 10000.0):
        self.fitting_size = fitting_size
        self.translate_amount = translate_amount
        self.scale = 0.0
        self.shape = 0.0
        self.small_score = 0.0
        self.sign = 1
        self.is_valid = False

    def fit_high(self, data: Sequence[float], fit_size: int = 0) -> bool:
        """Weibull-fit the top tail (MetaRecognition::FitHigh)."""
        lib = _load()
        if fit_size > 0:
            self.fitting_size = fit_size
        arr = np.ascontiguousarray(data, dtype=np.float64)
        scale = ctypes.c_double()
        shape = ctypes.c_double()
        small = ctypes.c_double()
        rval = lib.mr_fit_high(_as_double_ptr(arr), len(arr),
                               self.fitting_size, self.translate_amount,
                               ctypes.byref(scale), ctypes.byref(shape),
                               ctypes.byref(small))
        self.sign = 1
        self.is_valid = rval == 1
        if self.is_valid:
            self.scale, self.shape = scale.value, shape.value
            self.small_score = small.value
        return self.is_valid

    def w_score(self, x: float) -> float:
        if not self.is_valid:
            return -9999.0
        return _load().mr_w_score(float(x), self.scale, self.shape,
                                  self.translate_amount, self.small_score,
                                  self.sign)

    def w_score_vector(self, xs: Sequence[float]) -> np.ndarray:
        lib = _load()
        arr = np.ascontiguousarray(xs, dtype=np.float64)
        if not self.is_valid:
            # degenerate fit (e.g. tail too small): no rejection mass
            return np.zeros_like(arr)
        out = np.empty_like(arr)
        lib.mr_w_score_vector(_as_double_ptr(arr), len(arr), self.scale,
                              self.shape, self.translate_amount,
                              self.small_score, self.sign,
                              _as_double_ptr(out))
        return out

    def cdf(self, x: float) -> float:
        return self.w_score(x)

    def inv(self, p: float) -> float:
        if not self.is_valid:
            return -9999.0
        score = _load().mr_weibull_inv(float(p), self.scale, self.shape)
        return (score - self.translate_amount + self.small_score) \
            * self.sign

    # -------- persistence (JSON in place of the reference's str format)
    def to_dict(self) -> dict:
        return {'scale': self.scale, 'shape': self.shape,
                'small_score': self.small_score, 'sign': self.sign,
                'translate_amount': self.translate_amount,
                'fitting_size': self.fitting_size,
                'is_valid': self.is_valid}

    @classmethod
    def from_dict(cls, d: dict) -> 'MR':
        mr = cls(fitting_size=d.get('fitting_size', 9),
                 translate_amount=d.get('translate_amount', 10000.0))
        mr.scale = d['scale']
        mr.shape = d['shape']
        mr.small_score = d['small_score']
        mr.sign = d.get('sign', 1)
        mr.is_valid = d.get('is_valid', True)
        return mr

    def save(self, path: str) -> None:
        with open(path, 'w') as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> 'MR':
        with open(path) as f:
            return cls.from_dict(json.load(f))

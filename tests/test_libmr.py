"""Native libmr (Weibull meta-recognition) numeric checks, modeled on the
reference's self-test (experiments/openmax/libMR/test_libmr.py)."""

import numpy as np
import pytest

libmr = pytest.importorskip('opental_tpu.openset.libmr')


@pytest.fixture(scope='module')
def fitted():
    rng = np.random.RandomState(0)
    data = rng.weibull(2.0, 2000) * 5.0
    mr = libmr.MR()
    assert mr.fit_high(data, 20)
    return mr, data


def test_w_score_monotone_bounded(fitted):
    mr, data = fitted
    xs = np.linspace(data.min(), data.max() * 1.5, 50)
    ws = mr.w_score_vector(xs)
    assert np.all(np.diff(ws) >= -1e-12)
    assert ws.min() >= 0.0 and ws.max() <= 1.0
    # far beyond the tail -> near-certain outlier
    assert mr.w_score(data.max() * 2) > 0.99
    # scalar and vector paths agree
    assert abs(mr.w_score(xs[25]) - ws[25]) < 1e-12


def test_save_load_roundtrip(fitted, tmp_path):
    mr, data = fitted
    path = str(tmp_path / 'mr.json')
    mr.save(path)
    mr2 = libmr.MR.load(path)
    for x in np.linspace(0, data.max() * 1.2, 7):
        assert abs(mr.w_score(x) - mr2.w_score(x)) < 1e-12


def test_mle_recovers_params():
    import ctypes

    from opental_tpu.openset import libmr as L
    lib = L._load()
    lib.mr_weibull_fit.restype = ctypes.c_int
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mr_weibull_fit.argtypes = [dp, ctypes.c_int, dp, dp]
    rng = np.random.RandomState(1)
    for shape_true, scale_true in [(1.7, 3.0), (0.8, 10.0), (4.0, 1.0)]:
        samples = np.ascontiguousarray(
            rng.weibull(shape_true, 8000) * scale_true)
        s, k = ctypes.c_double(), ctypes.c_double()
        rv = lib.mr_weibull_fit(L._as_double_ptr(samples), len(samples),
                                ctypes.byref(s), ctypes.byref(k))
        assert rv == 1
        assert abs(s.value - scale_true) / scale_true < 0.05
        assert abs(k.value - shape_true) / shape_true < 0.05

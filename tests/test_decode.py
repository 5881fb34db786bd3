"""Decode math vs a numpy transliteration of the reference
decode_predictions (AFSD/thumos14/test.py:112-140)."""

import numpy as np
import jax.numpy as jnp

from opental_tpu.infer.decode import decode_windows
from opental_tpu.models.pyramid import make_priors


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def reference_decode(out, clip_length, os_head, use_edl):
    loc, prop_loc = out['loc'], out['prop_loc']
    priors = out['priors'][None, :, :1]
    pre_w = loc[..., :1] + loc[..., 1:]
    fused = 0.5 * pre_w * prop_loc + loc
    segments = np.concatenate([priors * clip_length - fused[..., :1],
                               priors * clip_length + fused[..., 1:]], -1)
    segments = np.clip(segments, 0, clip_length)
    unct = (out['unct'] + out['prop_unct']) / 2.0 if use_edl else None
    act = None
    if os_head:
        act = (sigmoid(out['act'][..., 0])
               + sigmoid(out['prop_act'][..., 0])) / 2.0
    conf = (softmax(out['conf']) + softmax(out['prop_conf'])) / 2.0
    conf = conf * sigmoid(out['center'])
    if os_head:
        conf = conf * act[..., None]
    return segments, conf, unct, act


def test_decode_windows_matches_reference_math():
    rng = np.random.RandomState(0)
    w, k, clip = 3, 15, 256
    priors = make_priors(clip).astype(np.float32)
    p = priors.shape[0]
    out = {
        'loc': np.exp(rng.randn(w, p, 2).astype(np.float32) * 0.4) * 10,
        'prop_loc': rng.randn(w, p, 2).astype(np.float32) * 0.2,
        'conf': rng.randn(w, p, k).astype(np.float32),
        'prop_conf': rng.randn(w, p, k).astype(np.float32),
        'center': rng.randn(w, p, 1).astype(np.float32),
        'act': rng.randn(w, p, 1).astype(np.float32),
        'prop_act': rng.randn(w, p, 1).astype(np.float32),
        'unct': rng.rand(w, p).astype(np.float32),
        'prop_unct': rng.rand(w, p).astype(np.float32),
        'priors': priors,
    }
    dec = decode_windows({kk: jnp.asarray(v) for kk, v in out.items()},
                         clip, use_edl=True, os_head=True,
                         score_func='softmax')
    segs, conf, unct, act = reference_decode(out, clip, True, True)
    np.testing.assert_allclose(np.asarray(dec.segments), segs, rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dec.scores), conf, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dec.uncertainty), unct,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dec.actionness), act, rtol=1e-5)


def test_decode_gcpl_negation():
    """GCPL scores are negated distances (test.py:85-87)."""
    rng = np.random.RandomState(1)
    w, k, clip = 1, 4, 128
    priors = make_priors(clip).astype(np.float32)
    p = priors.shape[0]
    out = {
        'loc': np.abs(rng.randn(w, p, 2).astype(np.float32)) * 5,
        'prop_loc': rng.randn(w, p, 2).astype(np.float32) * 0.1,
        'conf': rng.randn(w, p, k).astype(np.float32),
        'prop_conf': rng.randn(w, p, k).astype(np.float32),
        'center': rng.randn(w, p, 1).astype(np.float32),
        'priors': priors,
    }
    dec = decode_windows({kk: jnp.asarray(v) for kk, v in out.items()},
                         clip, score_func='softmax', negate_conf=True)
    want = (softmax(-out['conf']) + softmax(-out['prop_conf'])) / 2.0 \
        * sigmoid(out['center'])
    np.testing.assert_allclose(np.asarray(dec.scores), want, rtol=1e-4,
                               atol=1e-6)

"""Fast unit tests for search_param's raw-output cache mechanics.

Pins the round-5 review fixes: checkpoint-keyed cache invalidation (a
retrain must not silently sweep old head outputs), bucket-padded cache
rows sliced after decode (one jitted decode shape per bucket, not per
video), non-sticky conf_thresh on the cached pipeline, and
per-candidate artifact filenames that include conf_thresh.
"""

import json
import os

import numpy as np
import pytest

from opental_tpu.tools import search_param as sp


def test_sync_cache_manifest_invalidates_on_new_fingerprint(tmp_path):
    cache = str(tmp_path / 'raw_cache')
    os.makedirs(cache)
    np.savez(os.path.join(cache, 'video_a.npz'), x=np.zeros(2))
    sp.sync_cache_manifest(cache, 'ckpt@1.0')
    assert os.path.exists(os.path.join(cache, 'video_a.npz')), \
        'first sync must not drop entries'
    # same fingerprint: cache kept
    np.savez(os.path.join(cache, 'video_b.npz'), x=np.zeros(2))
    sp.sync_cache_manifest(cache, 'ckpt@1.0')
    assert os.path.exists(os.path.join(cache, 'video_b.npz'))
    # new fingerprint (retrain / repointed checkpoint): npzs dropped
    sp.sync_cache_manifest(cache, 'ckpt@2.0')
    assert not [f for f in os.listdir(cache) if f.endswith('.npz')]
    manifest = json.load(open(os.path.join(cache, 'manifest.json')))
    assert manifest['checkpoint'] == 'ckpt@2.0'


def _fake_pipe():
    class Pipe:
        clip_length = 128
        use_edl = False
        os_head = False
        evidence = 'exp'
        use_gcpl = False
        conf_thresh = None
        nms_sigma = None
        seen = []

        def _post_process(self, seconds, scores, unct, act):
            Pipe.seen.append(seconds.shape)
            return [{'cls': 1, 'score': 0.5,
                     'segment': [float(seconds[0, 0, 0]),
                                 float(seconds[0, 0, 1])],
                     'uncertainty': 0.0, 'actionness': 0.0}]
    return Pipe()


def test_evaluate_candidate_slices_padded_cache_and_tags(tmp_path,
                                                         monkeypatch):
    """Padded cache rows are sliced to the real window count after
    decode; conf_thresh=None restores the config default instead of
    inheriting the previous candidate; artifacts are tagged per
    (sigma, conf_thresh)."""
    from opental_tpu.config import Config

    pipe = _fake_pipe()
    idx_to_class = {1: 'ClassA'}
    monkeypatch.setattr(sp, '_cached_pipeline',
                        lambda cfg: (pipe, {}, idx_to_class))
    monkeypatch.setattr(
        sp, 'DetectionEvaluator',
        lambda *a, **k: type('E', (), {
            'evaluate': lambda self, kind: (None, 0.25, None)})())

    cache = str(tmp_path / 'cache')
    os.makedirs(cache)
    n, n_pad, priors = 3, 8, 4
    rng = np.random.RandomState(0)
    np.savez(os.path.join(cache, 'vid.npz'),
             offsets=np.arange(n, dtype=np.float32) * 64,
             sample_fps=np.float32(10.0), n=np.int32(n),
             loc=rng.rand(n_pad, priors, 2).astype(np.float32),
             conf=rng.rand(n_pad, priors, 3).astype(np.float32),
             prop_loc=rng.rand(n_pad, priors, 2).astype(np.float32),
             prop_conf=rng.rand(n_pad, priors, 3).astype(np.float32),
             center=rng.rand(n_pad, priors, 1).astype(np.float32),
             priors=rng.rand(priors, 1).astype(np.float32))

    cfg = Config({'testing': {'conf_thresh': 0.07},
                  'dataset': {'class_info_path': str(tmp_path / 'c.txt')}})
    open(str(tmp_path / 'c.txt'), 'w').write('ClassA\n')

    score = sp.evaluate_candidate(cfg, cache, ['vid'], 'unused_gt.json',
                                  str(tmp_path), sigma=0.5,
                                  conf_thresh=0.02)
    assert score == 0.25
    assert pipe.conf_thresh == 0.02
    # the decode consumed padded rows but post-processing saw only the
    # real n windows
    assert pipe.seen[-1][0] == n
    assert os.path.exists(os.path.join(
        tmp_path, 'search_sigma_0.50_ct_0.02.json'))

    sp.evaluate_candidate(cfg, cache, ['vid'], 'unused_gt.json',
                          str(tmp_path), sigma=0.5, conf_thresh=None)
    assert pipe.conf_thresh == 0.07, \
        'None candidate must restore the config default, not inherit'
    assert os.path.exists(os.path.join(tmp_path,
                                       'search_sigma_0.50.json'))


def test_legacy_trimmed_cache_still_reads(tmp_path, monkeypatch):
    """Caches written before the padding change (rows already trimmed
    to n, no 'n' key) keep working."""
    pipe = _fake_pipe()
    monkeypatch.setattr(sp, '_cached_pipeline',
                        lambda cfg: (pipe, {}, {1: 'ClassA'}))
    monkeypatch.setattr(
        sp, 'DetectionEvaluator',
        lambda *a, **k: type('E', (), {
            'evaluate': lambda self, kind: (None, 0.5, None)})())
    from opental_tpu.config import Config

    cache = str(tmp_path / 'cache')
    os.makedirs(cache)
    n, priors = 2, 4
    rng = np.random.RandomState(1)
    np.savez(os.path.join(cache, 'vid.npz'),
             offsets=np.arange(n, dtype=np.float32) * 64,
             sample_fps=np.float32(10.0),
             loc=rng.rand(n, priors, 2).astype(np.float32),
             conf=rng.rand(n, priors, 3).astype(np.float32),
             prop_loc=rng.rand(n, priors, 2).astype(np.float32),
             prop_conf=rng.rand(n, priors, 3).astype(np.float32),
             center=rng.rand(n, priors, 1).astype(np.float32),
             priors=rng.rand(priors, 1).astype(np.float32))
    cfg = Config({'testing': {},
                  'dataset': {'class_info_path': str(tmp_path / 'c.txt')}})
    open(str(tmp_path / 'c.txt'), 'w').write('ClassA\n')
    score = sp.evaluate_candidate(cfg, cache, ['vid'], 'gt.json',
                                  str(tmp_path), sigma=0.8)
    assert score == 0.5
    assert pipe.seen[-1][0] == n

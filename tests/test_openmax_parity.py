"""OpenMax parity vs the reference implementation.

Fast tests compare our vectorized recalibration (openset/openmax.py)
against the reference's per-proposal loop (AFSD/thumos14/openmax.py)
on matched inputs, sharing the same fitted MR objects so only the
recalibration math differs. The slow test drives the full
tools/test_openmax.py CLI (MAV extraction -> Weibull fit -> inference)
on the synthetic dataset.
"""

import json
import os

import numpy as np
import pytest

from tests.reference_stubs import install_reference_stubs


def _fit_mr(rng, loc=2.0, scale=0.5, n=40, tailsize=20):
    from opental_tpu.openset.libmr import MR
    dists = np.abs(rng.randn(n) * scale + loc)
    mr = MR()
    tail = np.sort(dists)[-tailsize:]
    mr.fit_high(tail, len(tail))
    return mr


def _make_weibull_model(rng, class_names, dim):
    model = {}
    for name in class_names:
        model[name] = {
            'mean_vec': rng.randn(dim).astype(np.float64),
            'model': [_fit_mr(rng)],
        }
    return model


def test_eucos_dist_matches_reference():
    """eucos_dist (vectorized) == compute_eucos_dist (scipy, per-pair)
    (AFSD/thumos14/openmax.py:7-9)."""
    install_reference_stubs()
    from AFSD.thumos14.openmax import compute_eucos_dist

    from opental_tpu.openset.openmax import eucos_dist

    rng = np.random.RandomState(0)
    mav = rng.randn(64)
    feats = rng.randn(10, 64)
    ours = eucos_dist(mav, feats)
    ref = np.array([compute_eucos_dist(mav, f) for f in feats])
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('rank', [1, 3])
def test_openmax_recalibration_matches_reference(rank):
    """Our vectorized OpenMax == the reference's per-proposal loop
    (AFSD/thumos14/openmax.py:21-86) with identical Weibull models:
    both sides share the same fitted MR objects (our ctypes MR exposes
    the scalar w_score the reference calls), so the comparison isolates
    the ranked-alpha + recalibration + softmax-with-unknown math."""
    install_reference_stubs()
    import torch
    from AFSD.thumos14.openmax import OpenMax as RefOpenMax

    from opental_tpu.openset.openmax import OpenMax

    rng = np.random.RandomState(1)
    k, d, n = 5, 32, 17
    names = [f'cls{i}' for i in range(k)]
    wm = _make_weibull_model(rng, names, d)

    ours = OpenMax(wm, rank=rank)
    ref = RefOpenMax(wm, rank=rank)

    logits = rng.randn(n, k).astype(np.float64)
    feats = rng.randn(n, d).astype(np.float64)
    out = ours(logits, feats)
    ref_out = ref(torch.from_numpy(logits),
                  torch.from_numpy(feats)).numpy()
    assert out.shape == (n, k + 1)
    np.testing.assert_allclose(out, ref_out, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, rtol=1e-9)


def test_openmax_unknown_mass_behavior():
    """An out-of-distribution feature far from every MAV collects most
    of the probability mass in the unknown slot; a feature AT a class
    MAV (zero eucos distance -> w_score ~ 0) keeps it negligible."""
    rng = np.random.RandomState(2)
    from opental_tpu.openset.openmax import OpenMax

    k, d = 4, 16
    names = [f'c{i}' for i in range(k)]
    wm = _make_weibull_model(rng, names, d)
    om = OpenMax(wm)

    logits = np.full((2, k), 2.0)
    logits[:, 1] = 6.0                       # confident top-1 class
    feats = np.stack([
        wm[names[1]]['mean_vec'],            # exactly at the class MAV
        wm[names[1]]['mean_vec'] + 4000.0,   # far outside every tail
    ])
    probs = om(logits, feats)
    assert probs[0, 0] < 0.05                # in-dist: tiny unknown mass
    assert probs[1, 0] > 0.5                 # OOD: unknown dominates


def test_openmax_featureless_class_noop(tmp_path):
    """A class with zero positive train matches gets a placeholder
    Weibull entry and recalibration is a NO-OP for it (the reference
    crashes on np.stack of the empty feature list,
    test_openmax.py:318-320 — PARITY.md Known deviations). Covers
    save_mav_dist placeholder -> weibull_fitting [None] ->
    OpenMax.__call__ wscore=0 end to end."""
    from opental_tpu.openset.openmax import (OpenMax, save_mav_dist,
                                             weibull_fitting)

    rng = np.random.RandomState(3)
    d = 16
    coarse = {'a': (rng.randn(d), np.abs(rng.randn(30)) + 1.0)}
    refined = {'a': (rng.randn(d), np.abs(rng.randn(30)) + 1.0)}
    save_mav_dist(str(tmp_path), coarse, refined,
                  class_names=['a', 'b'])
    wm, wpm = weibull_fitting(str(tmp_path), ['a', 'b'])
    assert wm['b']['model'][0] is None
    assert wpm['b']['model'][0] is None

    om = OpenMax(wm)
    logits = rng.randn(6, 2)
    feats = rng.randn(6, d)
    probs = om(logits, feats)
    # class b passes through unrecalibrated: its unknown-mass share is 0
    # and its softmax column uses the raw logit
    alpha = np.zeros_like(logits)
    alpha[np.arange(6), logits.argmax(1)] = 1.0
    ws = np.zeros((6, 2))
    from opental_tpu.openset.openmax import eucos_dist
    dist = eucos_dist(wm['a']['mean_vec'], feats)
    ws[:, 0] = wm['a']['model'][0].w_score_vector(dist)
    modified = logits * (1.0 - ws * alpha)
    unknown = logits - modified
    denom = np.exp(modified).sum(1) + np.exp(unknown.sum(1))
    np.testing.assert_allclose(probs[:, 2], np.exp(modified[:, 1]) / denom,
                               rtol=1e-12)


@pytest.mark.slow
def test_openmax_cli_end_to_end(tmp_path):
    """Full OpenMax pipeline on the synthetic dataset: random-init
    checkpoint -> MAV extraction over train clips -> per-class Weibull
    fit -> recalibrated inference JSON (tools/test_openmax.py; reference
    AFSD/thumos14/test_openmax.py stages 1-3). Also asserts the
    mav_dist stage cache makes the second invocation skip extraction."""
    import jax

    from opental_tpu import factory
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.tools import test_openmax as cli
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    root = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(root, clip_length=128, crop_size=32)
    # OpenMax runs on the closed-set softmax architecture (the reference
    # openmax config has no os_head/EDL: configs/thumos14_openmax.yaml;
    # conf keeps its background column that decode drops, conf[:, 1:])
    import yaml
    with open(cfg_path) as f:
        raw = yaml.safe_load(f)
    raw['model']['os_head'] = False
    raw['model']['use_edl'] = False
    raw['training']['edl_loss'] = False
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(raw, f)
    cfg = load_config(cfg_path)
    model = factory.build_model(cfg, frame_num=128)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 128, 32, 32, 3), np.float32))
    tx = make_optimizer(1e-5, 1e-3)
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(EDLConfig(num_classes=4)))
    ckpt.save(cfg.training['checkpoint_path'], 1, state,
              jax.random.PRNGKey(0))

    cli.main([cfg_path])

    out_json = os.path.join(cfg.testing['output_path'],
                            cfg.testing.get('output_json',
                                            'detection_results.json'))
    payload = json.load(open(out_json))
    assert set(payload) == {'version', 'results', 'external_data'}
    assert len(payload['results']) == 2
    for props in payload['results'].values():
        for p in props:
            assert set(p) == {'label', 'score', 'segment', 'uncertainty',
                              'actionness'}

    mav_dir = os.path.join(cfg.testing['output_path'], 'mav_dist')
    npzs = sorted(os.listdir(mav_dir))
    assert npzs, 'MAV extraction wrote no per-class npz files'
    data = np.load(os.path.join(mav_dir, npzs[0]))
    assert {'mav', 'dist', 'mav_prop', 'dist_prop'} <= set(data.files)

    # stage idempotence (test_openmax.py:407-414): cached npzs short-
    # circuit extraction; mutate one and confirm it is NOT recomputed
    marker = dict(np.load(os.path.join(mav_dir, npzs[0])))
    marker_mav = marker['mav'] + 123.0
    np.savez(os.path.join(mav_dir, npzs[0]), mav=marker_mav,
             dist=marker['dist'], mav_prop=marker['mav_prop'],
             dist_prop=marker['dist_prop'])
    cli.main([cfg_path])
    again = np.load(os.path.join(mav_dir, npzs[0]))
    np.testing.assert_allclose(again['mav'], marker_mav)

    # uint8 staging (default since round 5: raw windows + frames-valid,
    # normalized inside the jitted forward) must reproduce the f32
    # staging path — only the jitted /255 lowering's <=1 ulp separates
    # the two (tests/test_uint8_ingest.py)
    np.savez(os.path.join(mav_dir, npzs[0]), **marker)  # undo the marker
    from opental_tpu.data.thumos import get_video_info
    infos = get_video_info(cfg.get_path(
        'dataset.testing.video_info_path'))
    name = next(iter(infos))
    data = np.load(os.path.join(
        cfg.get_path('dataset.testing.video_data_path'), name + '.npy'))
    om_u8 = cli.OpenMaxInference(cfg, mav_dir)
    assert om_u8.u8_staging
    om_f32 = cli.OpenMaxInference(cfg, mav_dir, u8_staging=False)
    props_u8 = om_u8.run_video(data, infos[name]['sample_count'],
                               infos[name]['sample_fps'])
    props_f32 = om_f32.run_video(data, infos[name]['sample_count'],
                                 infos[name]['sample_fps'])
    assert len(props_u8) == len(props_f32) > 0
    # tie-robust pairing: the <=1 ulp between the two staging paths can
    # flip soft-NMS pick order between exactly-tied same-class proposals
    # (opental_tpu/utils/propmatch.py) — a positional zip pairs those
    # crosswise and explodes at stride scale
    from opental_tpu.utils.propmatch import pair_proposals
    askey = lambda p: {'cls': p['label'], 'score': p['score'],  # noqa: E731
                       'segment': p['segment'], 'prop': p}
    for a, b in pair_proposals([askey(p) for p in props_u8],
                               [askey(p) for p in props_f32]):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
        np.testing.assert_allclose(a['segment'], b['segment'],
                                   rtol=1e-4, atol=1e-4)

    # cross-data pad semantics (run_openmax_cross_data): a short ANet
    # video ships RAW uint8 with the PADDED sample_count — must equal
    # the reference's host 127.5-f32-pad (test_cross_data.py:80-89),
    # which normalizes to exactly 0.0 = the u8 frames-valid zero-fill.
    # Host-padding 127.5 into the u8 path instead would truncate to 127
    # (-0.0039 inside frames-valid) — stack_windows_u8 now raises on
    # float frames so that mistake is loud.
    short = data[:100]
    padded_count = 256  # driver uses 768; any padded length > t works
    padded_f32 = np.concatenate(
        [short.astype(np.float32),
         np.full((padded_count - short.shape[0],) + short.shape[1:],
                 127.5, np.float32)], 0)
    props_raw = om_u8.run_video(short, padded_count,
                                infos[name]['sample_fps'])
    props_ref = om_f32.run_video(padded_f32, padded_count,
                                 infos[name]['sample_fps'])
    assert len(props_raw) == len(props_ref) > 0
    for a, b in pair_proposals([askey(p) for p in props_raw],
                               [askey(p) for p in props_ref]):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
        np.testing.assert_allclose(a['segment'], b['segment'],
                                   rtol=1e-4, atol=1e-4)
    with pytest.raises(TypeError):
        om_u8.run_video(padded_f32, padded_count,
                        infos[name]['sample_fps'])

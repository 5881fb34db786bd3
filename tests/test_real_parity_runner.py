"""Smoke test for scripts/run_real_parity.py: the one-command real-data
parity runner must be mechanically sound so the environment-blocked
north-star claim (mAP@0.5 + OSDR within 0.5 pts of the reference's
released checkpoints) is executable the moment artifacts exist.

Assembles the reference's expected dataset layout (README.md:41-62)
from the synthetic generator, saves a random-init checkpoint, runs the
runner with --ref_json pointing at our OWN prediction file (self-parity
-> diffs exactly 0 -> exit 0), which drives: the packed+device_ingest
inference CLI path, both evaluator configurations (closed mAP on
known_gt + open-set AUC/OSDR on the full GT), and the report format.
"""

import json
import os
import shutil

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_real_parity_runner_self_parity(tmp_path):
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    from scripts.run_real_parity import main as runner_main

    synth = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(synth, clip_length=128,
                                      crop_size=32,
                                      ensure_class_coverage=True)
    cfg = load_config(cfg_path)

    # assemble the reference dataset layout the runner expects
    root = tmp_path / 'thumos14'
    (root / 'annotations').mkdir(parents=True)
    split_dir = root / 'annotations_open' / 'split_0'
    split_dir.mkdir(parents=True)
    shutil.copytree(os.path.join(synth, 'test_npy'), root / 'test_npy')
    anno = os.path.join(synth, 'annotations')
    shutil.copy(os.path.join(anno, 'test_video_info.csv'),
                root / 'annotations' / 'test_video_info.csv')
    shutil.copy(os.path.join(anno, 'Class_Index_Known.txt'),
                split_dir / 'Class_Index_Known.txt')
    shutil.copy(os.path.join(anno, 'test_Annotation_known.csv'),
                split_dir / 'test_Annotation_known.csv')
    with open(os.path.join(anno, 'gt_open.json')) as f:
        gt = json.load(f)
    with open(root / 'annotations' / 'thumos_gt.json', 'w') as f:
        json.dump(gt, f)
    known = set()
    with open(os.path.join(anno, 'Class_Index_Known.txt')) as f:
        for line in f:
            known.add(line.split(maxsplit=1)[1].strip())
    known_db = {
        name: {'subset': rec['subset'],
               'annotations': [a for a in rec['annotations']
                               if a['label'] in known]}
        for name, rec in gt['database'].items()}
    with open(split_dir / 'known_gt.json', 'w') as f:
        json.dump({'database': known_db}, f)

    # random-init checkpoint (tools/test.py loads orbax dirs and torch
    # .ckpt files alike)
    from opental_tpu import factory
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
    ckpt_path = os.path.join(cfg.training['checkpoint_path'],
                             'checkpoint-latest')

    work = str(tmp_path / 'work')
    # pass 1: ours only (no reference json yet) -> exit 0, prints metrics
    rc = runner_main(['--ckpt', ckpt_path, '--data_root', str(root),
                      '--split', '0', '--config', cfg_path,
                      '--workdir', work])
    assert rc == 0
    ours_json = os.path.join(work, 'ours/thumos14/split_0',
                             'thumos14_open_rgb.json')
    assert os.path.exists(ours_json)

    # pass 2: reference json := our own predictions -> diffs exactly 0
    rc = runner_main(['--ckpt', ckpt_path, '--data_root', str(root),
                      '--split', '0', '--config', cfg_path,
                      '--workdir', work, '--ref_json', ours_json])
    assert rc == 0
    report = json.load(open(os.path.join(work,
                                         'parity_thumos14_split_0.json')))
    assert report['diff_mAP@0.5_pts'] == 0.0
    assert report['diff_avg_OSDR_pts'] == 0.0
    assert report['ours'] == report['reference']


@pytest.mark.slow
def test_real_parity_runner_anet_self_parity(tmp_path):
    """--dataset anet twin (VERDICT r4 next #7): the runner drives the
    ANet inference CLI (tools/test_anet.py, 768-frame windows — here
    the synthetic generator's toy geometry) and the ANet evaluator
    configuration (tIoU .1:.5, known_val_gt/all_val_gt, validation
    subset, AFSD/anet/eval_open.py:16)."""
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer
    from opental_tpu.utils.synthetic import make_synthetic_anet_dataset

    from scripts.run_real_parity import main as runner_main

    synth = str(tmp_path / 'synth')
    cfg_path = make_synthetic_anet_dataset(synth, clip_length=256,
                                           crop_size=32, spatial=40,
                                           n_val=3)
    cfg = load_config(cfg_path)

    # assemble the reference ANet layout the runner expects
    root = tmp_path / 'activitynet'
    split_dir = root / 'annotations_open' / 'split_0'
    split_dir.mkdir(parents=True)
    shutil.copytree(os.path.join(synth, 'npy'),
                    root / 'train_val_npy_112')
    anno = os.path.join(synth, 'annotations')
    shutil.copy(os.path.join(anno, 'video_info.json'),
                split_dir / 'video_info_trainval_openset.json')
    shutil.copy(os.path.join(anno, 'action_known.txt'),
                split_dir / 'action_known.txt')
    with open(os.path.join(anno, 'gt_open.json')) as f:
        gt = json.load(f)
    with open(split_dir / 'all_val_gt.json', 'w') as f:
        json.dump(gt, f)
    known = set()
    with open(os.path.join(anno, 'action_known.txt')) as f:
        for line in f:
            if line.strip():
                known.add(line.strip().split()[-1])
    known_db = {
        name: {'subset': rec['subset'],
               'annotations': [a for a in rec['annotations']
                               if a['label'] in known]}
        for name, rec in gt['database'].items()}
    with open(split_dir / 'known_val_gt.json', 'w') as f:
        json.dump({'database': known_db}, f)

    from opental_tpu import factory
    model = factory.build_model(cfg, frame_num=256)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 256, 32, 32, 3), np.float32))
    tx = make_optimizer(1e-5, 1e-3)
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(EDLConfig(num_classes=4)))
    ckpt.save(cfg.training['checkpoint_path'], 1, state,
              jax.random.PRNGKey(0))
    ckpt_path = os.path.join(cfg.training['checkpoint_path'],
                             'checkpoint-latest')

    work = str(tmp_path / 'work')
    rc = runner_main(['--dataset', 'anet', '--ckpt', ckpt_path,
                      '--data_root', str(root), '--split', '0',
                      '--config', cfg_path, '--workdir', work])
    assert rc == 0
    ours_json = os.path.join(work, 'ours/anet/split_0',
                             'anet_open_rgb.json')
    assert os.path.exists(ours_json)

    rc = runner_main(['--dataset', 'anet', '--ckpt', ckpt_path,
                      '--data_root', str(root), '--split', '0',
                      '--config', cfg_path, '--workdir', work,
                      '--ref_json', ours_json])
    assert rc == 0
    report = json.load(open(os.path.join(work,
                                         'parity_anet_split_0.json')))
    assert report['dataset'] == 'anet'
    assert report['diff_mAP@0.5_pts'] == 0.0
    assert report['diff_avg_OSDR_pts'] == 0.0
    assert report['ours'] == report['reference']

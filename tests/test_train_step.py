"""Train-step smoke + sharded-data-parallel test on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.losses.edl import EDLConfig, EDLState
from opental_tpu.losses.multisegment import LossConfig
from opental_tpu.models.bdnet import BDNet
from opental_tpu.parallel import mesh as meshlib
from opental_tpu.train.step import (LossWeights, TrainState, make_optimizer,
                                    make_train_step)

FRAME = 128
CROP = 32


def tiny_model():
    return BDNet(num_classes=16, os_head=True, use_edl=True,
                 frame_num=FRAME)


def tiny_batch(batch_size=1, seed=0):
    rng = np.random.RandomState(seed)
    n_max = 4
    truths = np.zeros((batch_size, n_max, 2), np.float32)
    labels = np.zeros((batch_size, n_max), np.int32)
    gt_mask = np.zeros((batch_size, n_max), bool)
    for b in range(batch_size):
        k = rng.randint(1, n_max)
        s = rng.uniform(0, 0.7, k)
        e = s + rng.uniform(0.05, 0.3, k)
        truths[b, :k, 0], truths[b, :k, 1] = s, np.clip(e, 0, 1)
        labels[b, :k] = rng.randint(1, 16, k)
        gt_mask[b, :k] = True
    scores = (rng.rand(batch_size, 2, FRAME) > 0.9).astype(np.float32)
    return {
        'clips': jnp.asarray(rng.randn(batch_size, FRAME, CROP, CROP, 3),
                             jnp.float32),
        'truths': jnp.asarray(truths),
        'labels': jnp.asarray(labels),
        'gt_mask': jnp.asarray(gt_mask),
        'scores': jnp.asarray(scores),
        'ssl_clips': jnp.asarray(
            rng.randn(batch_size, FRAME, CROP, CROP, 3), jnp.float32),
        'ssl_props': jnp.asarray(
            np.tile(np.array([[10., 40.], [60., 100.], [45., 55.]],
                             np.float32), (batch_size, 1, 1))),
        'ssl_flags': jnp.ones((batch_size,), jnp.float32),
    }


def make_cfg():
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    iou_aware=True, with_ibm=True, ibm_start=10,
                    momentum=0.99, num_bins=50)
    return LossConfig(num_classes=15, clip_length=FRAME, piou=0.5,
                      cls_type='edl', edl=edl, os_head=True,
                      act_margin=1.0, act_weight=0.0)


@pytest.fixture(scope='module')
def setup():
    model = tiny_model()
    batch = tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch['clips'])
    cfg = make_cfg()
    tx = make_optimizer(1e-5, 1e-3)
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(cfg.edl))
    step_fn = jax.jit(make_train_step(model, cfg, LossWeights(), tx))
    return model, state, step_fn, batch


def test_train_step_runs_and_updates(setup):
    _, state, step_fn, batch = setup
    new_state, metrics = step_fn(state, batch, jnp.asarray(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f'{k} not finite: {v}'
    assert float(metrics['cost']) > 0
    assert int(new_state.step) == 1
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0
    # MIB inactive before ibm_start epoch: weight_accum unchanged
    np.testing.assert_array_equal(
        np.asarray(new_state.edl_state.weight_accum),
        np.asarray(state.edl_state.weight_accum))


def test_mib_state_updates_after_start(setup):
    _, state, step_fn, batch = setup
    new_state, _ = step_fn(state, batch, jnp.asarray(12))
    assert not np.allclose(np.asarray(new_state.edl_state.weight_accum),
                           np.asarray(state.edl_state.weight_accum))


def test_data_parallel_mesh(setup):
    model, state, _, _ = setup
    cfg = make_cfg()
    tx = make_optimizer(1e-5, 1e-3)
    step = make_train_step(model, cfg, LossWeights(), tx)
    mesh = meshlib.make_mesh()
    assert mesh.size == 8
    batch = tiny_batch(batch_size=8)
    batch = meshlib.shard_batch(mesh, batch)
    state = meshlib.replicate(mesh, state)
    jitted = jax.jit(step)
    new_state, metrics = jitted(state, batch, jnp.asarray(1))
    assert np.isfinite(float(metrics['cost']))
    assert int(new_state.step) == 1


def test_rpl_train_step_smoke():
    """RPL/GCPL training path: distances head + learnable radius."""
    model = BDNet(num_classes=16, os_head=False, use_edl=False,
                  use_rpl=True, frame_num=FRAME)
    batch = tiny_batch(seed=3)
    variables = model.init(jax.random.PRNGKey(1), batch['clips'])
    assert 'rpl_radius' in variables['params']['pyramid']
    cfg = LossConfig(num_classes=16, clip_length=FRAME, piou=0.5,
                     cls_type='rpl', os_head=False,
                     rpl_temperature=1.0, rpl_weight_pl=0.1)
    tx = make_optimizer(1e-5, 1e-3)
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=None)
    step_fn = jax.jit(make_train_step(model, cfg, LossWeights(ssl=0.0), tx))
    new_state, metrics = step_fn(state, batch, jnp.asarray(1))
    assert np.isfinite(float(metrics['cost']))
    r0 = float(state.params['pyramid']['rpl_radius'][0])
    r1 = float(new_state.params['pyramid']['rpl_radius'][0])
    assert r0 != r1, 'rpl radius should receive gradient'


@pytest.mark.slow
def test_fused_ssl_step_matches_sequential():
    """The fused main+SSL backbone pass (one conv batch of 2B,
    train_forward) must produce the same losses and gradients as the
    reference's two sequential forwards — frozen-BN configs only, where
    the fusion is math-exact (train/step.py fuse_ssl)."""
    model = tiny_model()
    cfg = make_cfg()
    weights = LossWeights()
    tx = make_optimizer(1e-5, 1e-3)
    batch = tiny_batch(batch_size=2, seed=3)
    variables = model.init(jax.random.PRNGKey(0), batch['clips'][:1])
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(cfg.edl))
    epoch = jnp.asarray(11)

    fused = jax.jit(make_train_step(model, cfg, weights, tx,
                                    fuse_ssl=True))
    seq = jax.jit(make_train_step(model, cfg, weights, tx))
    fs, fm = fused(state, batch, epoch)
    ss, sm = seq(state, batch, epoch)
    for k in sm:
        np.testing.assert_allclose(np.asarray(fm[k]), np.asarray(sm[k]),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=f'metric {k}')
    flat_s = jax.tree_util.tree_leaves_with_path(ss.params)
    flat_f = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(fs.params)}
    for path, a in flat_s:
        b = flat_f[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(path))

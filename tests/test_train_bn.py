"""BN freeze modes (thumos14/BDNet.py:39-49, BatchNorm3d(eps=1e-3,
momentum=0.01) i3d_backbone.py:43):

* default (freeze_bn + freeze_bn_affine): variable tree and outputs are
  byte-identical to the original frozen-only module;
* freeze_bn_affine: false -> gamma/beta become trainable params;
* freeze_bn: false -> train-mode BN: batch statistics normalize, running
  stats EMA-update — exact parity vs torch.nn.BatchNorm3d over multiple
  steps, and the full train step threads updated constants through
  TrainState.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.models.layers import FrozenBatchNorm


def _apply_train(mod, variables, x):
    y, mut = mod.apply(variables, x, mutable=['constants'])
    return y, {'params': variables.get('params', {}),
               'constants': mut['constants']}


def test_train_mode_matches_torch_batchnorm3d():
    import torch

    c = 5
    tbn = torch.nn.BatchNorm3d(c, eps=1e-3, momentum=0.01)
    tbn.train()
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor([1.0, 0.5, 2.0, -1.0, 0.3]))
        tbn.bias.copy_(torch.tensor([0.0, 1.0, -0.5, 0.2, 0.0]))

    mod = FrozenBatchNorm(c, freeze_stats=False, freeze_affine=False,
                          train_mode=True)
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 3, 4, 4, c).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    variables = dict(variables)
    variables['params'] = {
        'scale': jnp.asarray(tbn.weight.detach().numpy()),
        'bias': jnp.asarray(tbn.bias.detach().numpy())}

    for step in range(3):
        x = rng.randn(2, 3, 4, 4, c).astype(np.float32) * (step + 1)
        # torch is channels-second: (B, C, T, H, W)
        ty = tbn(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        jy, variables = _apply_train(mod, variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(jy), ty.detach().numpy().transpose(0, 2, 3, 4, 1),
            atol=1e-5, err_msg=f'step {step} output')
        np.testing.assert_allclose(
            np.asarray(variables['constants']['mean']),
            tbn.running_mean.numpy(), atol=1e-6,
            err_msg=f'step {step} running_mean')
        np.testing.assert_allclose(
            np.asarray(variables['constants']['var']),
            tbn.running_var.numpy(), rtol=1e-5,
            err_msg=f'step {step} running_var')


def test_default_tree_unchanged():
    mod = FrozenBatchNorm(4)
    x = jnp.ones((1, 2, 2, 2, 4))
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert set(variables) == {'constants'}
    assert set(variables['constants']) == {'scale', 'bias', 'mean', 'var'}
    # eval-mode semantics regardless of mutability
    y = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_affine_trainable_placement_and_grad():
    mod = FrozenBatchNorm(4, freeze_affine=False)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 2, 2, 4),
                    jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert set(variables['params']) == {'scale', 'bias'}
    assert set(variables['constants']) == {'mean', 'var'}

    def loss(params):
        return jnp.sum(mod.apply(
            {'params': params, 'constants': variables['constants']}, x))
    g = jax.grad(loss)(variables['params'])
    assert float(jnp.sum(jnp.abs(g['scale']))) > 0
    assert float(jnp.sum(jnp.abs(g['bias']))) > 0


@pytest.mark.slow
def test_train_step_updates_bn_stats(tmp_path):
    """freeze_bn: false end to end: the jitted train step normalizes by
    batch stats and writes EMA-updated running stats into
    TrainState.constants; backbone BN gammas receive gradients."""
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.losses.multisegment import LossConfig
    from opental_tpu.models.bdnet import BDNet
    from opental_tpu.train.step import (LossWeights, TrainState,
                                        make_optimizer, make_train_step)
    from opental_tpu.utils.synthetic import tiny_train_batch

    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=128, deterministic=False, freeze_bn=False,
                  freeze_bn_affine=False)
    batch = {k: jnp.asarray(v)
             for k, v in tiny_train_batch(1, 128, 32).items()}
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp')
    cfg = LossConfig(num_classes=15, clip_length=128, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True,
                     act_weight=0.1)
    tx = make_optimizer(1e-5, 1e-3)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch['clips'][:1])
    # affine now trainable: BN scale/bias must sit in params
    stem_bn = variables['params']['backbone']['Conv3d_1a_7x7']['bn']
    assert set(stem_bn) == {'scale', 'bias'}
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(edl))
    step = jax.jit(make_train_step(model, cfg, LossWeights(ssl=0.1), tx))
    new_state, metrics = step(state, batch, jnp.asarray(1))
    assert np.isfinite(float(metrics['cost']))

    old_mean = np.asarray(
        state.constants['backbone']['Conv3d_1a_7x7']['bn']['mean'])
    new_mean = np.asarray(
        new_state.constants['backbone']['Conv3d_1a_7x7']['bn']['mean'])
    assert not np.allclose(old_mean, new_mean), \
        'running stats did not update'
    old_scale = np.asarray(
        state.params['backbone']['Conv3d_1a_7x7']['bn']['scale'])
    new_scale = np.asarray(
        new_state.params['backbone']['Conv3d_1a_7x7']['bn']['scale'])
    assert not np.allclose(old_scale, new_scale), \
        'BN affine did not train'


def test_align_bn_collections():
    """Converted torch checkpoints rehome BN gamma/beta into 'params'
    when the template trains the affine (freeze_bn_affine: false)."""
    from opental_tpu.utils.torch_convert import align_bn_collections
    loaded = {'params': {'backbone': {'s': {'conv': {'kernel':
                                                     np.ones(2)}}}},
              'constants': {'backbone': {'s': {'bn': {
                  'scale': np.full(3, 2.0), 'bias': np.ones(3),
                  'mean': np.zeros(3), 'var': np.ones(3)}}}}}
    tmpl = {'backbone': {'s': {'conv': {'kernel': np.ones(2)},
                               'bn': {'scale': np.ones(3),
                                      'bias': np.zeros(3)}}}}
    out = align_bn_collections(loaded, tmpl)
    bn_p = out['params']['backbone']['s']['bn']
    assert set(bn_p) == {'scale', 'bias'}
    np.testing.assert_array_equal(bn_p['scale'], np.full(3, 2.0))
    assert set(out['constants']['backbone']['s']['bn']) == {'mean', 'var'}
    # frozen template: nothing moves, and no empty dict nodes are grown
    # into 'params' along constants-only paths
    out2 = align_bn_collections(loaded, {'backbone': {'s': {
        'conv': {'kernel': np.ones(2)}}}})
    assert set(out2['constants']['backbone']['s']['bn']) == {
        'scale', 'bias', 'mean', 'var'}
    assert set(out2['params']['backbone']['s']) == {'conv'}
    # a template branch with BN affine but a constants-only tree (no
    # params counterpart at all) must not leave empty nodes behind
    loaded3 = {'params': {},
               'constants': {'only': {'bn': {'mean': np.zeros(3),
                                             'var': np.ones(3)}}}}
    out3 = align_bn_collections(
        loaded3, {'only': {'bn': {'scale': np.ones(3),
                                  'bias': np.zeros(3)}}})
    assert out3['params'] == {}

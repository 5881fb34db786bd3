"""Full MultiSegmentLoss parity vs the reference
(AFSD/thumos14/multisegment_loss.py), with its module-level config
singleton stubbed. Batch size 1 (the shipped THUMOS configuration; for
B>1 the reference's iou_calib pairs batch-major logits with prior-major
ious — a bug our implementation fixes, so outputs intentionally differ)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from opental_tpu.losses.edl import EDLConfig, EDLState  # noqa: E402
from opental_tpu.losses.multisegment import (LossConfig,  # noqa: E402
                                             multisegment_loss)
from opental_tpu.models.pyramid import make_priors  # noqa: E402

CLIP = 256
K = 15
P = 126

EDL_CFG = {'loss_type': 'log', 'evidence': 'exp', 'iou_aware': True,
           'with_ibm': True, 'ibm_start': 0, 'momentum': 0.99,
           'num_bins': 50}


@pytest.fixture(autouse=True)
def ref_env(monkeypatch):
    sys.path.insert(0, '/root/reference')
    cfg_mod = types.ModuleType('AFSD.common.config')
    cfg_mod.config = {'dataset': {'training': {'clip_length': CLIP}}}
    sys.modules['AFSD.common.config'] = cfg_mod
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)
    yield
    sys.modules.pop('AFSD.common.config', None)


def rand_outputs(seed):
    rng = np.random.RandomState(seed)
    out = {
        'loc': np.exp(rng.randn(1, P, 2).astype(np.float32) * 0.5) * 8,
        'conf': rng.randn(1, P, K).astype(np.float32),
        'prop_loc': rng.randn(1, P, 2).astype(np.float32) * 0.2,
        'prop_conf': rng.randn(1, P, K).astype(np.float32),
        'center': rng.randn(1, P, 1).astype(np.float32),
        'priors': make_priors(CLIP).astype(np.float32),
        'act': rng.randn(1, P, 1).astype(np.float32),
        'prop_act': rng.randn(1, P, 1).astype(np.float32),
    }
    n_gt = rng.randint(1, 4)
    s = rng.uniform(0, 0.7, n_gt)
    e = np.clip(s + rng.uniform(0.05, 0.3, n_gt), 0, 1)
    labels = rng.randint(1, K + 1, n_gt)
    targets = np.stack([s, e, labels.astype(np.float64)], 1)
    return out, targets.astype(np.float32)


@pytest.mark.parametrize('seed', [0, 1])
def test_multisegment_parity_edl_oshead(seed):
    from AFSD.thumos14.multisegment_loss import MultiSegmentLoss
    out, targets = rand_outputs(seed)

    ref = MultiSegmentLoss(K, 0.5, 1.0, cls_loss_type='edl',
                           edl_config=dict(EDL_CFG), os_head=True,
                           act_config={'margin': 1.0, 'weight': 0.1})
    ref.cls_loss.epoch = 12
    t_out = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
             for k, v in out.items()}
    ref_losses = ref(t_out, [torch.from_numpy(targets)])
    names = ['loss_l', 'loss_c', 'loss_prop_l', 'loss_prop_c', 'loss_ct',
             'loss_act', 'loss_prop_act']
    want = {n: float(v) for n, v in zip(names, ref_losses)}

    cfg = LossConfig(num_classes=K, clip_length=CLIP, piou=0.5,
                     cls_type='edl',
                     edl=EDLConfig(num_classes=K, loss_type='log',
                                   evidence='exp', iou_aware=True,
                                   with_ibm=True, ibm_start=0,
                                   momentum=0.99, num_bins=50),
                     os_head=True, act_margin=1.0, act_weight=0.1)
    n_gt = targets.shape[0]
    losses, _ = multisegment_loss(
        cfg, {k: jnp.asarray(v) for k, v in out.items()},
        jnp.asarray(targets[None, :, :2]),
        jnp.asarray(targets[None, :, 2].astype(np.int32)),
        jnp.ones((1, n_gt), bool),
        edl_state=EDLState.create(cfg.edl), epoch=jnp.asarray(12))

    for n in names:
        np.testing.assert_allclose(float(losses[n]), want[n], rtol=3e-4,
                                   atol=1e-6, err_msg=n)


@pytest.mark.parametrize('seed', [2])
def test_multisegment_parity_focal_closed(seed):
    """Closed-set focal configuration (AFSD softmax baseline)."""
    from AFSD.thumos14.multisegment_loss import MultiSegmentLoss
    out, targets = rand_outputs(seed)
    kk = K + 1  # closed set keeps the background channel
    rng = np.random.RandomState(seed + 100)
    out['conf'] = rng.randn(1, P, kk).astype(np.float32)
    out['prop_conf'] = rng.randn(1, P, kk).astype(np.float32)

    ref = MultiSegmentLoss(kk, 0.5, 1.0, cls_loss_type='focal')
    t_out = {k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
             for k, v in out.items()}
    ref_losses = ref(t_out, [torch.from_numpy(targets)])
    names = ['loss_l', 'loss_c', 'loss_prop_l', 'loss_prop_c', 'loss_ct']
    want = {n: float(v) for n, v in zip(names, ref_losses[:5])}

    cfg = LossConfig(num_classes=kk, clip_length=CLIP, piou=0.5,
                     cls_type='focal', os_head=False)
    n_gt = targets.shape[0]
    losses, _ = multisegment_loss(
        cfg, {k: jnp.asarray(v) for k, v in out.items()},
        jnp.asarray(targets[None, :, :2]),
        jnp.asarray(targets[None, :, 2].astype(np.int32)),
        jnp.ones((1, n_gt), bool), epoch=jnp.asarray(0))
    for n in names:
        np.testing.assert_allclose(float(losses[n]), want[n], rtol=3e-4,
                                   atol=1e-6, err_msg=n)

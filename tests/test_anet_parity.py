"""ANet-variant parity vs the reference torch implementation: full
BDNet forward (768-frame) and the ANet MultiSegmentLoss."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opental_tpu.losses.anet_multisegment import (  # noqa: E402
    anet_multisegment_loss)
from opental_tpu.losses.edl import EDLConfig, EDLState  # noqa: E402
from opental_tpu.losses.multisegment import LossConfig  # noqa: E402
from opental_tpu.models.anet_pyramid import make_anet_priors  # noqa: E402
from opental_tpu.models.bdnet import BDNet  # noqa: E402
from opental_tpu.utils import torch_convert as tc  # noqa: E402

REF = '/root/reference'
CLIP = 768
K = 15
P = 189


def _install_stubs(monkeypatch, num_classes=16):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cfg = {
        'dataset': {'num_classes': num_classes,
                    'training': {'clip_length': CLIP}},
        'model': {'freeze_bn': True, 'freeze_bn_affine': True,
                  'evidence': 'exp', 'os_head': True,
                  'backbone_model': None},
    }
    cfg_mod = types.ModuleType('AFSD.common.config')
    cfg_mod.config = cfg
    sys.modules['AFSD.common.config'] = cfg_mod

    bmp_mod = types.ModuleType('AFSD.prop_pooling.boundary_pooling_op')

    class BoundaryMaxPooling(torch.nn.Module):
        def forward(self, x, segments):
            b, c, t = x.shape
            k = segments.shape[1]
            out = x.new_zeros(b, c, k)
            seg = segments.long()
            for n in range(b):
                for ki in range(k):
                    for st in range(2):
                        l = int(seg[n, ki, st * 2].clamp(0, t - 1))
                        r = max(int(seg[n, ki, st * 2 + 1].clamp(0, t - 1)),
                                l)
                        half = c // 2
                        sl = slice(st * half, (st + 1) * half)
                        out[n, sl, ki] = x[n, sl, l:r + 1].max(-1).values
            return out

    bmp_mod.BoundaryMaxPooling = BoundaryMaxPooling
    sys.modules['AFSD.prop_pooling.boundary_pooling_op'] = bmp_mod
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)
    # the reference model modules are cached with the first stub config;
    # force reimport
    for mod in list(sys.modules):
        if mod.startswith('AFSD.anet'):
            sys.modules.pop(mod)


@pytest.mark.slow
def test_anet_bdnet_forward_parity(monkeypatch):
    _install_stubs(monkeypatch)
    from AFSD.anet.BDNet import BDNet as TorchBDNet

    torch.manual_seed(0)
    ref = TorchBDNet(in_channels=3, training=False, use_edl=True)
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    ref.eval()

    variables = tc.convert_state_dict(ref.state_dict(),
                                      tc.map_anet_bdnet_key)
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, arch='anet')
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, CLIP, 96, 96).astype(np.float32) * 0.5
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    tmpl = model.init(jax.random.PRNGKey(0), x_jax)
    merged = {
        'params': tc.merge_variables(tmpl['params'], variables['params'],
                                     strict=True),
        'constants': tc.merge_variables(tmpl['constants'],
                                        variables['constants'],
                                        strict=True),
    }
    out = model.apply(merged, x_jax)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    for key in ('loc', 'conf', 'prop_loc', 'prop_conf', 'center', 'act',
                'prop_act', 'start', 'end', 'unct', 'prop_unct'):
        want = ref_out[key].numpy()
        got = np.asarray(out[key])
        assert got.shape == want.shape, (key, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-3,
                                   err_msg=key)
    np.testing.assert_allclose(np.asarray(out['priors']),
                               ref_out['priors'].numpy(), atol=1e-7)


@pytest.mark.parametrize('seed,batch', [(0, 1), (1, 2)])
def test_anet_multisegment_loss_parity(monkeypatch, seed, batch):
    _install_stubs(monkeypatch)
    from AFSD.anet.multisegment_loss import MultiSegmentLoss

    rng = np.random.RandomState(seed)
    out = {
        'loc': np.exp(rng.randn(batch, P, 2).astype(np.float32) * 0.5) * 30,
        'conf': rng.randn(batch, P, K).astype(np.float32),
        'prop_loc': rng.randn(batch, P, 2).astype(np.float32) * 0.2,
        'prop_conf': rng.randn(batch, P, K).astype(np.float32),
        'center': rng.randn(batch, P, 1).astype(np.float32),
        'priors': make_anet_priors(CLIP).astype(np.float32),
        'act': rng.randn(batch, P, 1).astype(np.float32),
        'prop_act': rng.randn(batch, P, 1).astype(np.float32),
    }
    targets = []
    for _ in range(batch):
        n_gt = rng.randint(1, 4)
        s = rng.uniform(0, 0.7, n_gt)
        e = np.clip(s + rng.uniform(0.05, 0.4, n_gt), 0, 1)
        lbl = rng.randint(1, K + 1, n_gt)
        targets.append(np.stack([s, e, lbl.astype(np.float64)],
                                1).astype(np.float32))

    edl_cfg = {'loss_type': 'log', 'evidence': 'exp', 'iou_aware': True,
               'with_ibm': True, 'ibm_start': 0, 'momentum': 0.99,
               'num_bins': 50}
    ref = MultiSegmentLoss(K, 0.5, 1.0, cls_loss_type='edl',
                           edl_config=dict(edl_cfg), os_head=True)
    ref.cls_loss.epoch = 12
    preds = tuple(torch.from_numpy(out[k]) for k in
                  ('loc', 'conf', 'prop_loc', 'prop_conf', 'center',
                   'priors', 'act', 'prop_act'))
    ref_losses = ref(preds, [torch.from_numpy(t) for t in targets])
    names = ['loss_l', 'loss_c', 'loss_prop_l', 'loss_prop_c', 'loss_ct',
             'loss_act', 'loss_prop_act']
    want = {n: float(v) for n, v in zip(names, ref_losses)}

    n_max = max(t.shape[0] for t in targets)
    truths = np.zeros((batch, n_max, 2), np.float32)
    labels = np.zeros((batch, n_max), np.int32)
    mask = np.zeros((batch, n_max), bool)
    for i, t in enumerate(targets):
        truths[i, :len(t)] = t[:, :2]
        labels[i, :len(t)] = t[:, 2].astype(np.int32)
        mask[i, :len(t)] = True

    cfg = LossConfig(num_classes=K, clip_length=CLIP, piou=0.5,
                     cls_type='edl',
                     edl=EDLConfig(num_classes=K, loss_type='log',
                                   evidence='exp', iou_aware=True,
                                   with_ibm=True, ibm_exp=True,
                                   ibm_start=0),
                     os_head=True, act_weight=0.1)
    losses, _ = anet_multisegment_loss(
        cfg, {k: jnp.asarray(v) for k, v in out.items()},
        jnp.asarray(truths), jnp.asarray(labels), jnp.asarray(mask),
        edl_state=EDLState.create(cfg.edl), epoch=jnp.asarray(12))
    for n in names:
        np.testing.assert_allclose(float(losses[n]), want[n], rtol=5e-4,
                                   atol=1e-6, err_msg=n)

"""ANet k-step whole-train parity vs the reference torch trainer.

The ANet twin of tests/test_train_kstep_parity.py — the THUMOS k-step
test caught a gradient-topology bug (live centerness-BCE IoU target)
that NO value-level test could see, and the ANet loss got that fix by
inspection only (VERDICT r4 missing #2). This test closes the gap: three
full optimizer steps in both frameworks from an identical converted
init on identical data, with the ANet trainer's exact composition —
  * dual-LR Adam param groups: backbone at lr*0.1
    (AFSD/anet/train.py:304-311; ours train/step.make_anet_optimizer),
  * frame-level boundary BCE + x0.1 prop-level BCE on the 1/8-
    subsampled score heatmaps (anet/train.py:134-187; the reference's
    F.interpolate(scale_factor=1/8) is nearest, i.e. scores[..., ::8]),
  * per-sample loss normalization averaged over the batch, adaptive
    refined threshold min(piou, max_iou), smooth-L1 refined loc, and
    the LIVE (undetached, clamp_(min=0)) centerness IoU target
    (anet/multisegment_loss.py:210-222),
  * the stateless exp-form MIB weighting of the ANet EvidenceLoss
    (anet/cls_loss.py:225-231; EDLConfig.ibm_exp), with epochs crossing
    ibm_start=10 (9 -> 10 -> 11),
  * the SSL triplet pass with the cost composition of run_one_epoch
    (anet/train.py:192-241).

Clip length: the reference ANet BDNet hardcodes `feat_t = 768 // 8` at
module level (anet/BDNet.py:21) while everything else derives from the
config clip_length / the frame_num ctor arg — the test monkeypatches
feat_t to 32 and runs both frameworks at 256 frames, which is a fair
like-for-like comparison at 1/3 the compute of the deployed 768 (the
768 geometry itself is covered by tests/test_anet_parity.py's forward
and loss value-parity tests).

Heavy: two full 256x96x96 train graphs on one CPU core (~15-25 min).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opental_tpu.losses.edl import EDLConfig, EDLState  # noqa: E402
from opental_tpu.losses.multisegment import LossConfig  # noqa: E402
from opental_tpu.models.bdnet import BDNet  # noqa: E402
from opental_tpu.train.step import (LossWeights, TrainState,  # noqa: E402
                                    make_anet_optimizer, make_train_step)
from opental_tpu.utils import torch_convert as tc  # noqa: E402

REF = '/root/reference'
CLIP, CROP = 256, 96          # feat_t monkeypatched 96 -> 32 (docstring)
K = 15                        # known classes (num_classes=16, os_head)
EPOCHS = (9, 10, 11)          # crosses ibm_start=10
LW = dict(lw=1.0, cw=10.0, ctw=1.0, actw=1.0, ssl=0.1)  # config.py:23-28
EDL_CFG = {'loss_type': 'log', 'evidence': 'exp', 'iou_aware': True,
           'with_ibm': True, 'ibm_start': 10, 'ibm_coeff': 10}


def _install_anet_stubs(monkeypatch, tmp_path):
    """ANet-config twin of reference_stubs.install_reference_stubs,
    extended with the training keys AFSD/anet/train.py binds at import
    (train.py:15-36)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cfg = {
        'dataset': {'num_classes': K + 1,
                    'training': {'clip_length': CLIP}},
        'model': {'freeze_bn': True, 'freeze_bn_affine': True,
                  'evidence': 'exp', 'os_head': True,
                  'backbone_model': None, 'in_channels': 3},
        'training': {'batch_size': 1, 'learning_rate': 1e-5,
                     'weight_decay': 1e-3, 'max_epoch': 25,
                     'focal_loss': False, 'edl_loss': True,
                     'edl_config': dict(EDL_CFG), 'random_seed': 2020,
                     'resume': 0, 'piou': 0.5,
                     'checkpoint_path': str(tmp_path / 'ckpt'), **LW},
        'testing': {'split': 1},   # split != 0 keeps tensorboard off
    }
    cfg_mod = types.ModuleType('AFSD.common.config')
    cfg_mod.config = cfg
    sys.modules['AFSD.common.config'] = cfg_mod

    bmp_mod = types.ModuleType('AFSD.prop_pooling.boundary_pooling_op')
    from reference_stubs import BoundaryMaxPooling
    bmp_mod.BoundaryMaxPooling = BoundaryMaxPooling
    sys.modules['AFSD.prop_pooling.boundary_pooling_op'] = bmp_mod
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, 'cuda',
                        lambda self, *a, **k: self, raising=False)
    # reference modules freeze whichever config they saw first — purge
    for mod in list(sys.modules):
        if mod.startswith('AFSD.anet') or mod == 'AFSD.common.anet_dataset':
            sys.modules.pop(mod)


def _batch(rng):
    """One bs=1 synthetic batch in both frameworks' layouts. ANet
    heatmaps carry (action, start, end) rows (anet_dataset.py:78-92)."""
    clips = (rng.rand(1, 3, CLIP, CROP, CROP).astype(np.float32) * 2 - 1)
    s = np.array([0.10, 0.55], np.float32)
    e = np.array([0.35, 0.80], np.float32)
    labels = np.array([3, 7], np.float32)
    targets = np.stack([s, e, labels], 1)          # (N, 3) normalized
    scores = (rng.rand(1, 3, CLIP) > 0.9).astype(np.float32)
    ssl_clips = (rng.rand(1, 3, CLIP, CROP, CROP).astype(np.float32)
                 * 2 - 1)
    ssl_props = np.array([[20.0, 80.0], [120.0, 200.0], [90.0, 110.0]],
                         np.float32)
    return {'clips': clips, 'targets': targets, 'scores': scores,
            'ssl_clips': ssl_clips, 'ssl_props': ssl_props}


def _torch_steps(ref, batches):
    """3 reference Adam steps with the dual-LR param groups
    (anet/train.py:304-311); returns (per-step costs, final params)."""
    import AFSD.anet.train as ref_train
    from AFSD.anet.multisegment_loss import MultiSegmentLoss

    net = ref
    net.train()
    optimizer = torch.optim.Adam([
        {'params': net.backbone.parameters(), 'lr': 1e-5 * 0.1,
         'weight_decay': 1e-3},
        {'params': net.coarse_pyramid_detection.parameters(),
         'lr': 1e-5, 'weight_decay': 1e-3},
    ])
    cpd = MultiSegmentLoss(K, 0.5, 1.0, cls_loss_type='edl',
                           edl_config=dict(EDL_CFG), os_head=True)
    ref_train.CPD_Loss = cpd       # forward_one_epoch reads the global
    costs = []
    for epoch, b in zip(EPOCHS, batches):
        cpd.cls_loss.epoch = epoch          # anet/train.py:368-370
        cpd.cls_loss.total_epoch = 25
        clips = torch.from_numpy(b['clips'])
        targets = [torch.from_numpy(b['targets'])]
        scores = torch.from_numpy(b['scores'])
        (loss_l, loss_c, loss_prop_l, loss_prop_c, loss_ct, loss_start,
         loss_end, loss_act, loss_act_prop) = ref_train.forward_one_epoch(
            net, clips, targets, scores, training=True, ssl=False)
        # cost composition: anet/train.py:214-228
        cost = (LW['lw'] * loss_l + LW['cw'] * loss_c
                + LW['lw'] * loss_prop_l + LW['cw'] * loss_prop_c
                + LW['ctw'] * loss_ct + loss_start + loss_end
                + LW['actw'] * (loss_act + loss_act_prop))
        loss_trip = ref_train.forward_one_epoch(
            net, torch.from_numpy(b['ssl_clips']),
            [torch.from_numpy(b['ssl_props'])], training=True, ssl=True)
        cost = cost + LW['ssl'] * loss_trip
        optimizer.zero_grad()
        cost.backward()
        optimizer.step()
        costs.append(float(cost.detach()))
    return costs, net.state_dict()


def _jax_steps(init_variables, batches):
    model = BDNet(num_classes=K + 1, os_head=True, use_edl=True,
                  frame_num=CLIP, arch='anet')
    edl = EDLConfig(num_classes=K, loss_type='log', evidence='exp',
                    iou_aware=True, with_ibm=True, ibm_exp=True,
                    ibm_coeff=10.0, ibm_start=10)
    cfg = LossConfig(num_classes=K, clip_length=CLIP, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True,
                     act_margin=1.0, act_weight=0.1, variant='anet')
    tx = make_anet_optimizer(1e-5, 1e-3)
    state = TrainState(params=init_variables['params'],
                       constants=init_variables['constants'],
                       opt_state=tx.init(init_variables['params']),
                       edl_state=EDLState.create(edl))
    step = jax.jit(make_train_step(model, cfg, LossWeights(**LW), tx))
    costs = []
    for epoch, b in zip(EPOCHS, batches):
        batch = {
            'clips': jnp.asarray(
                np.transpose(b['clips'], (0, 2, 3, 4, 1))),
            'truths': jnp.asarray(b['targets'][None, :, :2]),
            'labels': jnp.asarray(
                b['targets'][None, :, 2].astype(np.int32)),
            'gt_mask': jnp.ones((1, b['targets'].shape[0]), bool),
            'scores': jnp.asarray(b['scores']),
            'ssl_clips': jnp.asarray(
                np.transpose(b['ssl_clips'], (0, 2, 3, 4, 1))),
            'ssl_props': jnp.asarray(b['ssl_props'][None]),
            'ssl_flags': jnp.ones((1,), jnp.float32),
        }
        state, metrics = step(state, batch, jnp.asarray(epoch))
        costs.append(float(metrics['cost']))
    return costs, state


@pytest.mark.slow
def test_anet_train_kstep_parity(tmp_path, monkeypatch):
    _install_anet_stubs(monkeypatch, tmp_path)
    import AFSD.anet.BDNet as ref_bdnet_mod
    # the 768-frame geometry constant (anet/BDNet.py:21); everything
    # else derives from config clip_length / the frame_num ctor arg
    monkeypatch.setattr(ref_bdnet_mod, 'feat_t', CLIP // 8)
    from AFSD.anet.BDNet import BDNet as TorchBDNet

    torch.manual_seed(0)
    # training=False skips the pretrained-backbone load; net.train()
    # in _torch_steps still gives train-mode semantics (frozen BN)
    ref = TorchBDNet(in_channels=3, training=False, use_edl=True,
                     frame_num=CLIP)
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.8, 1.2)

    init = tc.convert_state_dict(
        {k: v.clone() for k, v in ref.state_dict().items()},
        tc.map_anet_bdnet_key)
    model = BDNet(num_classes=K + 1, os_head=True, use_edl=True,
                  frame_num=CLIP, arch='anet')
    tmpl = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, CLIP, CROP, CROP, 3), jnp.float32))
    variables = {
        'params': tc.merge_variables(tmpl['params'], init['params'],
                                     strict=True),
        'constants': tc.merge_variables(tmpl['constants'],
                                        init['constants'], strict=True),
    }
    init_flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, variables['params']))

    rng = np.random.RandomState(42)
    batches = [_batch(rng) for _ in EPOCHS]

    torch_costs, torch_final = _torch_steps(ref, batches)
    jax_costs, final_state = _jax_steps(variables, batches)

    # per-step total cost parity across the ibm_start gate; the rtol is
    # ~100x the measured CPU f32 envelope of the THUMOS twin (8e-7) —
    # tight enough to catch the loss_ct gradient-topology bug class
    # (1.4e-3 / 4.6e-3 divergence at steps 2-3 pre-fix there)
    np.testing.assert_allclose(jax_costs, torch_costs, rtol=1e-4)

    # 3-step parameter-delta parity in global L2 (elementwise is
    # ill-posed where Adam normalizes a near-zero gradient); the
    # backbone group moves at lr*0.1, so a dual-LR mismatch shows up
    # here as a large relative error on the dominant head deltas
    final = tc.convert_state_dict(torch_final, tc.map_anet_bdnet_key)
    want_final = tc.merge_variables(tmpl['params'], final['params'],
                                    strict=True)
    want_flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, want_final))
    got_flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, final_state.params))
    num = den = 0.0
    for p0, pw, pg in zip(init_flat, want_flat, got_flat):
        dw = (pw - p0).ravel()
        dg = (pg.astype(np.float32) - p0).ravel()
        num += float(np.sum((dg - dw) ** 2))
        den += float(np.sum(dw ** 2))
    assert den > 0, 'torch made no parameter update'
    rel = (num / den) ** 0.5
    assert rel < 0.02, f'3-step param-delta divergence {rel:.4f}'

    assert all(c > 0 for c in torch_costs)

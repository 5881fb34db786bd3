"""k-step whole-train parity vs the reference torch trainer.

Everything up to one loss evaluation is covered piecewise by the other
parity tests; this is the last link: run THREE full optimizer steps in
both frameworks from an identical converted init on identical data and
compare per-step training costs and the final parameter deltas. The
torch side uses the reference's own train machinery —
`forward_one_epoch` + `calc_bce_loss` from AFSD/thumos14/train.py with
the exact cost composition of run_one_epoch (train.py:225-241) and
`torch.optim.Adam(lr=1e-5, weight_decay=1e-3)` (train.py:321-323) — and
steps cross the MIB epoch gate (epochs 9 -> 10 -> 11 around
ibm_start=10, train.py:359-362), so the EDL EMA state evolution, the
epoch-gated loss schedule, Adam moment accumulation and the SSL triplet
all compose across steps.

NOTE the reference trainer's cls_loss_type overwrite
(train.py:27,31 — an EDL config degrades to focal because the RPL line
clobbers the selection): the loss here is constructed directly with
cls_loss_type='edl' as train.py:329 would receive with the un-clobbered
value (see PARITY.md "Known deviations").

Building this test caught a real gradient-topology bug no value-level
test could see: loss_ct's IoU target was stop_gradient'ed while the
reference leaves it live (multisegment_loss.py:184-189), zeroing
prop_loc_head's largest gradient term (step-1 global grad rel L2 was
2.9e-2; 3.2e-4 after the fix, worst leaves tiny-magnitude backbone conv
float noise).

Heavy: two full 256x96x96 train graphs on one CPU core (~15-25 min).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opental_tpu.losses.edl import EDLConfig, EDLState  # noqa: E402
from opental_tpu.losses.multisegment import LossConfig  # noqa: E402
from opental_tpu.models.bdnet import BDNet  # noqa: E402
from opental_tpu.train.step import (LossWeights, TrainState,  # noqa: E402
                                    make_optimizer, make_train_step)
from opental_tpu.utils import torch_convert as tc  # noqa: E402

from reference_stubs import (STUB_CONFIG, install_reference_stubs,  # noqa: E402
                             patch_cuda_to_cpu)

CLIP, CROP = 256, 96          # reference BDNet is fixed at 256x96x96
EPOCHS = (9, 10, 11)          # crosses the ibm_start=10 MIB gate
LW = dict(lw=1.0, cw=10.0, ctw=1.0, actw=1.0, ssl=0.1)  # config.py:23-28
EDL_CFG = {'loss_type': 'log', 'evidence': 'exp', 'iou_aware': True,
           'with_ibm': True, 'ibm_start': 10, 'momentum': 0.99,
           'num_bins': 50}


def _batch(rng):
    """One bs=1 synthetic batch in both frameworks' layouts."""
    clips = (rng.rand(1, 3, CLIP, CROP, CROP).astype(np.float32) * 2 - 1)
    n_gt = 2
    s = np.array([0.10, 0.55], np.float32)
    e = np.array([0.35, 0.80], np.float32)
    labels = np.array([3, 7], np.float32)
    targets = np.stack([s, e, labels], 1)          # (N, 3) normalized
    scores = (rng.rand(1, 2, CLIP) > 0.9).astype(np.float32)
    ssl_clips = (rng.rand(1, 3, CLIP, CROP, CROP).astype(np.float32)
                 * 2 - 1)
    # ssl proposals in frame units (thumos_dataset cut-paste output)
    ssl_props = np.array([[20.0, 80.0], [120.0, 200.0], [90.0, 110.0]],
                         np.float32)
    return {
        'clips': clips, 'targets': targets, 'scores': scores,
        'ssl_clips': ssl_clips, 'ssl_props': ssl_props,
    }


def _torch_steps(ref, batches):
    """3 reference Adam steps; returns (per-step costs, final params)."""
    import AFSD.thumos14.train as ref_train
    from AFSD.thumos14.multisegment_loss import MultiSegmentLoss

    net = ref
    net.train()
    optimizer = torch.optim.Adam(net.parameters(), lr=1e-5,
                                 weight_decay=1e-3)
    cpd = MultiSegmentLoss(15, 0.5, 1.0, cls_loss_type='edl',
                           edl_config=dict(EDL_CFG), os_head=True,
                           act_config={'margin': 1.0, 'weight': 0.1})
    # the test drives forward_one_epoch directly; it reads these globals
    ref_train.CPD_Loss = cpd
    costs = []
    for epoch, b in zip(EPOCHS, batches):
        cpd.cls_loss.epoch = epoch          # train.py:360-362
        cpd.cls_loss.total_epoch = 25
        clips = torch.from_numpy(b['clips'])
        targets = [torch.from_numpy(b['targets'])]
        scores = torch.from_numpy(b['scores'])
        (loss_l, loss_c, loss_prop_l, loss_prop_c, loss_ct, loss_start,
         loss_end, loss_act, loss_act_prop) = ref_train.forward_one_epoch(
            net, clips, targets, scores, training=True, ssl=False)
        # cost composition: train.py:225-241
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
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP)
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    iou_aware=True, with_ibm=True, ibm_start=10,
                    momentum=0.99, num_bins=50)
    cfg = LossConfig(num_classes=15, clip_length=CLIP, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True,
                     act_margin=1.0, act_weight=0.1)
    tx = make_optimizer(1e-5, 1e-3)
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
def test_train_kstep_parity(tmp_path, monkeypatch):
    install_reference_stubs()
    patch_cuda_to_cpu(monkeypatch)
    # AFSD/thumos14/train.py binds these at module import (train.py:17-44);
    # values are the reference argparse defaults (common/config.py:23-28).
    # split=1 keeps the tensorboard writer off (train.py:41).
    STUB_CONFIG['training'].update({
        'batch_size': 1, 'learning_rate': 1e-5, 'weight_decay': 1e-3,
        'max_epoch': 25, 'focal_loss': False, 'random_seed': 2020,
        'resume': 0, 'checkpoint_path': str(tmp_path / 'ckpt'),
        'edl_loss': True, 'edl_config': dict(EDL_CFG),
        'lw': LW['lw'], 'cw': LW['cw'], 'ctw': LW['ctw'],
        'actw': LW['actw'], 'ssl': LW['ssl'], 'piou': 0.5,
        'act_config': {'margin': 1.0, 'weight': 0.1},
    })
    STUB_CONFIG['testing']['split'] = 1
    from AFSD.thumos14.BDNet import BDNet as TorchBDNet

    torch.manual_seed(0)
    # training=False skips the pretrained-backbone load (no .pt file in
    # this environment); net.train() below still gives train-mode
    # semantics with the stub config's frozen BN
    ref = TorchBDNet(in_channels=3, training=False, use_edl=True,
                     use_rpl=False)
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.8, 1.2)

    init = tc.convert_state_dict(
        {k: v.clone() for k, v in ref.state_dict().items()},
        tc.map_bdnet_key)
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP)
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

    # per-step total cost parity across the MIB gate. Measured envelope
    # when this test was built (CPU f32): per-step rel <= 8e-7 — the
    # rtol here is ~100x that. This bound DOES discriminate: before the
    # round-4 loss_ct gradient-topology fix (the reference's undetached
    # centerness BCE target, losses/multisegment.py) steps 2-3 diverged
    # at 1.4e-3 / 4.6e-3.
    np.testing.assert_allclose(jax_costs, torch_costs, rtol=1e-4)

    # final parameter deltas: convert the torch final state and compare
    # the 3-step update in global L2 (elementwise comparison is
    # ill-posed where Adam normalizes a near-zero gradient: the m/sqrt(v)
    # direction flips sign under float noise, a +-2*lr outlier)
    final = tc.convert_state_dict(torch_final, tc.map_bdnet_key)
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
    # measured 0.0049 when built — below even the intrinsic chaos floor
    # of a +-1e-7 init perturbation run through torch twice (0.0126);
    # the pre-fix gradient-topology bug measured 0.27 here
    assert rel < 0.02, f'3-step param-delta divergence {rel:.4f}'

    # the torch side actually moved: guards against a silent no-op run
    assert all(c > 0 for c in torch_costs)

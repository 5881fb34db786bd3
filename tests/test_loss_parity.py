"""Loss parity vs the reference cls_loss.py (pure torch, importable).

Covers: plain EDL (log/digamma), EDL+focal, MIB (with stateful
weight_accum evolution across steps), iou_calib, focal loss, and the PU
actionness loss — all on random tensors, masked fixed-shape ours vs
dynamic-gather reference.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')
torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from opental_tpu.losses.cls import actionness_loss, focal_loss  # noqa: E402
from opental_tpu.losses.edl import (EDLConfig, EDLState,  # noqa: E402
                                    evidence_loss, iou_calibration)


@pytest.fixture(autouse=True)
def no_cuda(monkeypatch):
    # the reference MIB branch calls .cuda() at init (cls_loss.py:114)
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)


def rand_case(seed, n=200, k=15):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, k).astype(np.float32) * 2
    target = rng.randint(0, k, n)
    return logits, target


@pytest.mark.parametrize('loss_type', ['log', 'digamma', 'mse'])
def test_edl_plain(loss_type):
    from AFSD.thumos14.cls_loss import EvidenceLoss
    logits, target = rand_case(0)
    ref = EvidenceLoss(15, {'loss_type': loss_type, 'evidence': 'exp'})
    want = float(ref(torch.from_numpy(logits),
                     torch.from_numpy(target).view(-1, 1)))

    cfg = EDLConfig(num_classes=15, loss_type=loss_type, evidence='exp')
    got, _ = evidence_loss(cfg, jnp.asarray(logits), jnp.asarray(target),
                           jnp.ones(len(target), bool),
                           EDLState.create(cfg), jnp.asarray(0))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_edl_focal():
    from AFSD.thumos14.cls_loss import EvidenceLoss
    logits, target = rand_case(1)
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_focal': True, 'alpha': 0.25, 'gamma': 2})
    want = float(ref(torch.from_numpy(logits),
                     torch.from_numpy(target).view(-1, 1)))
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_focal=True, alpha=0.25, gamma=2.0)
    got, _ = evidence_loss(cfg, jnp.asarray(logits), jnp.asarray(target),
                           jnp.ones(len(target), bool),
                           EDLState.create(cfg), jnp.asarray(0))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_edl_mib_state_and_loss_two_steps():
    from AFSD.thumos14.cls_loss import EvidenceLoss
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_ibm': True, 'ibm_start': 0,
                            'momentum': 0.99, 'num_bins': 50})
    ref.epoch = 5
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_ibm=True, ibm_start=0, momentum=0.99, num_bins=50)
    state = EDLState.create(cfg)
    for seed in (2, 3):
        logits, target = rand_case(seed)
        want = float(ref(torch.from_numpy(logits),
                         torch.from_numpy(target).view(-1, 1)))
        got, state = evidence_loss(cfg, jnp.asarray(logits),
                                   jnp.asarray(target),
                                   jnp.ones(len(target), bool), state,
                                   jnp.asarray(5))
        np.testing.assert_allclose(float(got), want, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(state.weight_accum),
                                   ref.weight_accum.numpy(), rtol=2e-5)


def test_edl_mib_masked_rows_match_gathered():
    """Masked invalid rows must reproduce the reference's pre-gathered
    call exactly (os_head keeps positives only)."""
    from AFSD.thumos14.cls_loss import EvidenceLoss
    rng = np.random.RandomState(4)
    logits = rng.randn(300, 15).astype(np.float32)
    target = rng.randint(0, 15, 300)
    keep = rng.rand(300) > 0.6

    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_ibm': True, 'ibm_start': 0})
    ref.epoch = 12
    want = float(ref(torch.from_numpy(logits[keep]),
                     torch.from_numpy(target[keep]).view(-1, 1)))

    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_ibm=True, ibm_start=0)
    got, state = evidence_loss(cfg, jnp.asarray(logits),
                               jnp.asarray(target), jnp.asarray(keep),
                               EDLState.create(cfg), jnp.asarray(12))
    np.testing.assert_allclose(float(got), want, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(state.weight_accum),
                               ref.weight_accum.numpy(), rtol=2e-5)


def test_iou_calib():
    from AFSD.thumos14.cls_loss import EvidenceLoss
    logits, _ = rand_case(5)
    rng = np.random.RandomState(5)
    ious = rng.uniform(-0.2, 1.0, len(logits)).astype(np.float32)
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'iou_aware': True})
    want = float(ref.iou_calib(torch.from_numpy(logits),
                               torch.from_numpy(ious.copy()), mean=True))
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    iou_aware=True)
    got = iou_calibration(cfg, jnp.asarray(logits), jnp.asarray(ious),
                          mean=True)
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_focal():
    from AFSD.thumos14.cls_loss import FocalLoss_Ori
    rng = np.random.RandomState(6)
    n, k = 150, 16
    probs = rng.dirichlet(np.ones(k), n).astype(np.float32)
    target = rng.randint(0, k, n)
    ref = FocalLoss_Ori(k, balance_index=0, size_average=False, alpha=0.25)
    want = float(ref(torch.from_numpy(probs),
                     torch.from_numpy(target).view(-1, 1)))
    got = focal_loss(jnp.asarray(probs), jnp.asarray(target),
                     jnp.ones(n, bool), k, alpha=0.25)
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


@pytest.mark.parametrize('seed,pos_rate', [(7, 0.3), (8, 0.02), (9, 0.0)])
def test_actionness(seed, pos_rate):
    from AFSD.thumos14.cls_loss import ActionnessLoss
    rng = np.random.RandomState(seed)
    n = 120
    logits = rng.randn(n, 1).astype(np.float32)
    labels = (rng.rand(n) < pos_rate).astype(np.float32)
    ref = ActionnessLoss(size_average=False,
                         cfg={'weight': 0.1, 'margin': 1.0})
    want, want_count = ref(torch.from_numpy(logits),
                           torch.from_numpy(labels.copy()))
    got, got_count = actionness_loss(jnp.asarray(logits[:, 0]),
                                     jnp.asarray(labels),
                                     jnp.ones(n, bool), margin=1.0,
                                     rank_weight=0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
    assert int(got_count) == int(want_count)


@pytest.mark.parametrize('evidence', ['relu', 'softplus'])
def test_edl_evidence_variants(evidence):
    """relu / softplus evidence transforms (cls_loss.py:182-190) — the
    shipped configs use exp; these cover the other two ablation values."""
    from AFSD.thumos14.cls_loss import EvidenceLoss
    logits, target = rand_case(10)
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': evidence})
    want = float(ref(torch.from_numpy(logits),
                     torch.from_numpy(target).view(-1, 1)))
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence=evidence)
    got, _ = evidence_loss(cfg, jnp.asarray(logits), jnp.asarray(target),
                           jnp.ones(len(target), bool),
                           EDLState.create(cfg), jnp.asarray(0))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


@pytest.mark.parametrize('momentum', [0.75, 0.0])
def test_edl_ghm_state_and_loss_two_steps(momentum):
    """GHM weighting (cls_loss.py:228-249): per-element grad-norm bins,
    1/acc_sum (or 1/count at momentum 0) weights normalized by the valid
    bin count, with acc_sum EMA evolving across steps."""
    from AFSD.thumos14.cls_loss import EvidenceLoss
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_ghm': True, 'ghm_start': 0,
                            'momentum': momentum, 'num_bins': 50})
    ref.epoch = 5
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_ghm=True, ghm_start=0, momentum=momentum,
                    num_bins=50)
    state = EDLState.create(cfg)
    for seed in (11, 12):
        logits, target = rand_case(seed)
        want = float(ref(torch.from_numpy(logits),
                         torch.from_numpy(target).view(-1, 1)))
        got, state = evidence_loss(cfg, jnp.asarray(logits),
                                   jnp.asarray(target),
                                   jnp.ones(len(target), bool), state,
                                   jnp.asarray(5))
        np.testing.assert_allclose(float(got), want, rtol=2e-4)
        if momentum > 0:
            np.testing.assert_allclose(np.asarray(state.acc_sum),
                                       np.asarray(ref.acc_sum), rtol=2e-5)


def test_edl_ghm_before_start_is_plain_and_frozen():
    """epoch < ghm_start: the reference falls through to the unweighted
    loss and acc_sum stays untouched (cls_loss.py:228)."""
    from AFSD.thumos14.cls_loss import EvidenceLoss
    logits, target = rand_case(13)
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_ghm': True, 'ghm_start': 10,
                            'momentum': 0.75, 'num_bins': 50})
    ref.epoch = 3
    want = float(ref(torch.from_numpy(logits),
                     torch.from_numpy(target).view(-1, 1)))
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_ghm=True, ghm_start=10, momentum=0.75,
                    num_bins=50)
    state0 = EDLState.create(cfg)
    got, state = evidence_loss(cfg, jnp.asarray(logits),
                               jnp.asarray(target),
                               jnp.ones(len(target), bool), state0,
                               jnp.asarray(3))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(state.acc_sum),
                                  np.asarray(state0.acc_sum))


@pytest.mark.parametrize('epoch', [12, 3])
def test_edl_ibloss(epoch):
    """IB loss (cls_loss.py:250-256): 1/(grad_norm * detached feat L1)
    row weights after ib_start, plain before."""
    from AFSD.thumos14.cls_loss import EvidenceLoss
    logits, target = rand_case(14)
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_ibloss': True})
    ref.epoch = epoch
    want = float(ref(torch.from_numpy(logits),
                     torch.from_numpy(target).view(-1, 1)))
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_ibloss=True, ib_start=10)
    got, _ = evidence_loss(cfg, jnp.asarray(logits), jnp.asarray(target),
                           jnp.ones(len(target), bool),
                           EDLState.create(cfg), jnp.asarray(epoch))
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_edl_ghm_masked_rows_match_gathered():
    """GHM bin counts must come from valid rows only."""
    from AFSD.thumos14.cls_loss import EvidenceLoss
    rng = np.random.RandomState(15)
    logits = rng.randn(300, 15).astype(np.float32)
    target = rng.randint(0, 15, 300)
    keep = rng.rand(300) > 0.6
    ref = EvidenceLoss(15, {'loss_type': 'log', 'evidence': 'exp',
                            'with_ghm': True, 'ghm_start': 0,
                            'momentum': 0.75, 'num_bins': 50})
    ref.epoch = 5
    want = float(ref(torch.from_numpy(logits[keep]),
                     torch.from_numpy(target[keep]).view(-1, 1)))
    cfg = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    with_ghm=True, ghm_start=0, momentum=0.75,
                    num_bins=50)
    got, state = evidence_loss(cfg, jnp.asarray(logits),
                               jnp.asarray(target), jnp.asarray(keep),
                               EDLState.create(cfg), jnp.asarray(5))
    np.testing.assert_allclose(float(got), want, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(state.acc_sum),
                               np.asarray(ref.acc_sum), rtol=2e-5)

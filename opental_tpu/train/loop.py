"""Epoch training loop driver.

Replaces the reference __main__ of AFSD/thumos14/train.py:306-363: builds
model/loss/optimizer/dataset from a Config, runs jitted steps with the
EDL epoch schedule, logs metrics, and checkpoints per epoch (after epoch
10, matching train.py:290-292) with resume support.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu import factory
from opental_tpu.config import Config
from opental_tpu.data.thumos import (ThumosTrainDataset, get_video_anno,
                                     get_video_info)
from opental_tpu.losses.edl import EDLState
from opental_tpu.parallel import mesh as meshlib
from opental_tpu.train import checkpoint as ckpt
from opental_tpu.train.step import (TrainState, make_optimizer,
                                    make_train_step)
from opental_tpu.utils.torch_convert import (convert_i3d_checkpoint,
                                             merge_variables)


class MetricsLogger:
    """JSONL metrics stream + optional TensorBoard scalars + epoch
    summaries (the reference logs via tensorboardX for split 0 only,
    train.py:254-268)."""

    def __init__(self, workdir: str, enabled: bool = True,
                 tensorboard: bool = True):
        self.enabled = enabled
        self.path = os.path.join(workdir, 'metrics.jsonl')
        self._tb = None
        if enabled:
            os.makedirs(workdir, exist_ok=True)
            self._f = open(self.path, 'a')
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(
                        os.path.join(workdir, 'tensorboard'))
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        rec = {'step': step}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + '\n')
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != 'step':
                    self._tb.add_scalar(f'train/{k}', v, step)


def init_state(cfg: Config, model, tx, rng_key,
               sample_clip_shape) -> TrainState:
    """Initialize params (glorot, as reference reset_params) and overlay
    the pretrained I3D backbone (thumos14/BDNet.py:448-452)."""
    # jitted init: un-jitted tracing dispatches thousands of single ops,
    # pathological through the remote-device tunnel (CLAUDE.md gotcha)
    variables = jax.jit(model.init)(rng_key,
                                    jnp.zeros(sample_clip_shape,
                                              jnp.float32))
    if model.arch == 'anet':
        # normal(0, 0.01) tower/head re-init on top of glorot
        # (anet/BDNet.py:448-451)
        from opental_tpu.models.anet_pyramid import reinit_anet_heads
        variables = dict(variables)
        variables['params'] = reinit_anet_heads(variables['params'],
                                                rng_key)
    backbone_path = cfg.get_path('model.backbone_model')
    if backbone_path and os.path.exists(backbone_path):
        from opental_tpu.utils.torch_convert import align_bn_collections
        loaded = convert_i3d_checkpoint(backbone_path)
        # freeze_bn_affine: false templates train gamma/beta as params
        loaded = align_bn_collections(loaded, variables['params'])
        variables = {
            'params': merge_variables(variables['params'],
                                      loaded['params']),
            'constants': merge_variables(variables['constants'],
                                         loaded['constants']),
        }
    loss_cfg = factory.build_loss_config(cfg)
    edl_state = (EDLState.create(loss_cfg.edl)
                 if loss_cfg.edl is not None else None)
    return TrainState(params=variables['params'],
                      constants=variables['constants'],
                      opt_state=tx.init(variables['params']),
                      edl_state=edl_state)


def train(cfg: Config, max_steps_per_epoch: Optional[int] = None,
          use_mesh: Optional[bool] = None, log_every: int = 20,
          prefetch_depth: int = 2) -> TrainState:
    """Full training run from a reference-schema Config.

    Input batches are assembled and device-placed `prefetch_depth` steps
    ahead on a background thread (the reference's DataLoader-worker
    analog, train.py:345), and metrics are fetched from device only
    every `log_every` steps so the step loop never blocks on host sync.

    use_mesh=None reads `training.use_mesh` from the config (CLI flag
    --use_mesh); True shards the batch axis over all visible devices
    (the reference's default DataParallel wrap, train.py:316).
    """
    tr = cfg.training
    if use_mesh is None:
        use_mesh = bool(tr.get('use_mesh', False))
    clip_length = cfg.get_path('dataset.training.clip_length', 256)
    crop_size = cfg.get_path('dataset.training.crop_size', 96)
    batch_size = tr.get('batch_size', 1)
    seed = tr.get('random_seed', 2020)

    # train mode (reference model.train()): enables dropout (rng is
    # threaded per step) and, when freeze_bn: false, train-mode BN stat
    # updates; shipped configs have dropout 0 + frozen BN, where this is
    # numerically identical to the old deterministic build
    model = factory.build_model(cfg, deterministic=False)
    loss_cfg = factory.build_loss_config(cfg)
    weights = factory.build_loss_weights(cfg)
    if model.arch == 'anet':
        # ANet trains the backbone at lr * 0.1 (anet/train.py:304-311)
        from opental_tpu.train.step import make_anet_optimizer
        tx = make_anet_optimizer(tr['learning_rate'], tr['weight_decay'])
    else:
        tx = make_optimizer(tr['learning_rate'], tr['weight_decay'])
    step_fn = jax.jit(make_train_step(model, loss_cfg, weights, tx))

    if model.arch == 'anet':
        from opental_tpu.data.anet import AnetTrainDataset
        dataset = AnetTrainDataset(
            cfg.get_path('dataset.training.video_info_path'),
            cfg.get_path('dataset.training.video_data_path'),
            clip_length=clip_length, crop_size=crop_size, seed=seed,
            binary_class=cfg.get_path('dataset.binary_class', False),
            uint8_ingest=bool(tr.get('uint8_ingest', False)))
    else:
        video_infos = get_video_info(
            cfg.get_path('dataset.training.video_info_path'))
        video_annos = get_video_anno(
            video_infos, cfg.get_path('dataset.training.video_anno_path'),
            cfg.get_path('dataset.class_info_path'))
        dataset = ThumosTrainDataset(
            cfg.get_path('dataset.training.video_data_path'), video_infos,
            video_annos, clip_length=clip_length, crop_size=crop_size,
            stride=cfg.get_path('dataset.training.clip_stride', 30),
            seed=seed,
            # training.uint8_ingest: ship raw uint8 clips and normalize
            # on device (exact; 4x less host->device transfer per step)
            uint8_ingest=bool(tr.get('uint8_ingest', False)))

    checkpoint_path = tr.get('checkpoint_path', './checkpoints')
    logger = MetricsLogger(checkpoint_path,
                           enabled=cfg.get_path('testing.split', 0) == 0)

    rng_key = jax.random.PRNGKey(seed)
    resume = tr.get('resume', 0)
    if resume == -1:
        # fault tolerance: resume from the newest checkpoint if any
        # (restart-safe training; the reference only supports explicit
        # epoch numbers, train.py:121-131)
        latest = ckpt.latest_epoch(checkpoint_path)
        resume = latest if latest is not None else 0
    if resume and resume > 0:
        template = init_state(cfg, model, tx, rng_key,
                              (1, clip_length, crop_size, crop_size,
                               model.in_channels))
        state, _, restored_rng = ckpt.restore(checkpoint_path, resume,
                                              template)
        if restored_rng is not None:
            rng_key = restored_rng
        start_epoch = resume + 1
    else:
        state = init_state(cfg, model, tx, rng_key,
                           (1, clip_length, crop_size, crop_size,
                            model.in_channels))
        start_epoch = 1

    mesh = meshlib.make_mesh() if use_mesh else None
    if mesh is not None:
        state = meshlib.replicate(mesh, state)

    from opental_tpu.data.prefetch import prefetch

    def place(batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return (meshlib.shard_batch(mesh, batch) if mesh is not None
                else batch)

    max_epoch = tr.get('max_epoch', 25)
    global_step = int(state.step)
    for epoch in range(start_epoch, max_epoch + 1):
        t0 = time.time()
        epoch_metrics: Dict[str, float] = {}
        n_steps = 0
        pending = []  # (step, device-metrics) fetched every log_every

        def flush(pending):
            for s, fetched in jax.device_get(pending):
                logger.log(s, fetched)
                for k, v in fetched.items():
                    epoch_metrics[k] = epoch_metrics.get(k, 0.0) + float(v)
            pending.clear()

        for batch in prefetch(dataset.batches(batch_size), place,
                              depth=prefetch_depth):
            rng_key, sub = jax.random.split(rng_key)
            state, metrics = step_fn(state, batch, jnp.asarray(epoch), sub)
            global_step += 1
            n_steps += 1
            pending.append((global_step, metrics))
            if len(pending) >= max(1, log_every):
                flush(pending)
            if max_steps_per_epoch and n_steps >= max_steps_per_epoch:
                break
        flush(pending)
        means = {k: v / max(n_steps, 1) for k, v in epoch_metrics.items()}
        print(f'Epoch-{epoch} Train Loss: Total - {means.get("cost", 0):.5f}'
              f', loc - {means.get("loss_l", 0):.5f}'
              f', conf - {means.get("loss_c", 0):.5f}'
              f', prop_loc - {means.get("loss_prop_l", 0):.5f}'
              f', prop_conf - {means.get("loss_prop_c", 0):.5f}'
              f', IoU - {means.get("loss_ct", 0):.5f}'
              f', start - {means.get("loss_start", 0):.5f}'
              f', end - {means.get("loss_end", 0):.5f}'
              f' [{time.time() - t0:.1f}s]')
        if epoch > 10:
            ckpt.save(checkpoint_path, epoch, state, rng_key)
    return state

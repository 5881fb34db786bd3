"""Train-step throughput vs batch size (real TPU, full OpenTAL-final
loss incl. EDL-MIB + PU actionness + SSL). Pass --bf16 to run the
backbone conv stack in bf16 (params stay f32)."""
import sys
import time

import jax
import jax.numpy as jnp

from opental_tpu.losses.edl import EDLConfig, EDLState
from opental_tpu.losses.multisegment import LossConfig
from opental_tpu.models.bdnet import BDNet
from opental_tpu.train.step import (LossWeights, TrainState, make_optimizer,
                                    make_train_step)
from opental_tpu.utils.synthetic import tiny_train_batch

CLIP, CROP = 256, 96


def main():
    bf16 = '--bf16' in sys.argv
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP,
                  dtype=jnp.bfloat16 if bf16 else None)
    print('compute dtype:', 'bf16' if bf16 else 'f32', flush=True)
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    iou_aware=True, with_ibm=True, ibm_start=10)
    cfg = LossConfig(num_classes=15, clip_length=CLIP, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True, act_weight=0.1)
    tx = make_optimizer(1e-5, 1e-3)

    for bs in ((16,) if '--bs16' in sys.argv else (1, 4, 8)):
        batch = {k: jnp.asarray(v)
                 for k, v in tiny_train_batch(bs, CLIP, CROP).items()}
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        batch['clips'][:1])
        state = TrainState(params=variables['params'],
                           constants=variables['constants'],
                           opt_state=tx.init(variables['params']),
                           edl_state=EDLState.create(edl))
        step = jax.jit(make_train_step(model, cfg, LossWeights(), tx))
        epoch = jnp.asarray(11)
        state, metrics = step(state, batch, epoch)
        float(metrics['cost'])
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, epoch)
        float(metrics['cost'])
        dt = (time.perf_counter() - t0) / n
        print(f'bs={bs:2d}: {dt*1000:7.1f} ms/step = {bs/dt:6.2f} clips/s',
              flush=True)


if __name__ == '__main__':
    main()

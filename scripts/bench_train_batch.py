"""Train-step throughput sweep over (batch, dtype, remat) on the real
TPU — full OpenTAL-final loss (EDL-MIB + iou_calib + PU actionness +
SSL triplet), 256-frame 96x96 clips.

Usage:
  python scripts/bench_train_batch.py --bs 1,8,16 [--bf16] [--remat]

Prints ms/step, clips/s, and train MFU from the COMPILED step's XLA
cost analysis (honest total FLOPs incl. the SSL second backbone pass
and the remat recompute, not a hand-derived 3x-forward estimate).

Measurement notes (CLAUDE.md): batches are generated on device (a bs=16
f32 batch is 3.6 GB — minutes through the tunnel, nothing on a real
link); iterations serialize through the TrainState data dependency and
sync once at the end.
"""
import sys
import time

import jax
import jax.numpy as jnp

from opental_tpu.losses.edl import EDLConfig, EDLState
from opental_tpu.losses.multisegment import LossConfig
from opental_tpu.models.bdnet import BDNet
from opental_tpu.train.step import (LossWeights, TrainState, make_optimizer,
                                    make_train_step)
from opental_tpu.utils.synthetic import device_train_batch

CLIP, CROP = 256, 96
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12


def arg(flag, default=None):
    if flag in sys.argv:
        i = sys.argv.index(flag)
        return sys.argv[i + 1] if i + 1 < len(sys.argv) else True
    return default


def main():
    bf16 = '--bf16' in sys.argv
    remat = '--remat' in sys.argv
    tfold = '--tfold' in sys.argv
    sizes = [int(b) for b in (arg('--bs') or '1,8,16').split(',')]
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, remat=remat, trunk_tfold=tfold,
                  dtype=jnp.bfloat16 if bf16 else None)
    peak = V5E_PEAK_BF16 if bf16 else V5E_PEAK_F32
    print(f'dtype={"bf16" if bf16 else "f32"} remat={remat} '
          f'tfold={tfold}', flush=True)
    edl = EDLConfig(num_classes=15, loss_type='log', evidence='exp',
                    iou_aware=True, with_ibm=True, ibm_start=10)
    cfg = LossConfig(num_classes=15, clip_length=CLIP, piou=0.5,
                     cls_type='edl', edl=edl, os_head=True, act_weight=0.1)
    tx = make_optimizer(1e-5, 1e-3)

    def run_one(bs):
        # a helper frame: its device buffers (batch/state/compiled
        # executable) free on return — leftovers across sizes OOM bs>=16
        batch = device_train_batch(bs, CLIP, CROP)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        batch['clips'][:1])
        state = TrainState(params=variables['params'],
                           constants=variables['constants'],
                           opt_state=tx.init(variables['params']),
                           edl_state=EDLState.create(edl))
        step_fn = make_train_step(model, cfg, LossWeights(), tx)
        epoch = jnp.asarray(11)
        compiled = jax.jit(step_fn).lower(state, batch, epoch).compile()
        cost = compiled.cost_analysis()
        flops = (cost or {}).get('flops', 0.0)
        state, metrics = compiled(state, batch, epoch)
        float(metrics['cost'])
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = compiled(state, batch, epoch)
        float(metrics['cost'])
        dt = (time.perf_counter() - t0) / n
        mfu = flops / dt / peak if flops else float('nan')
        print(f'bs={bs:2d}: {dt*1000:7.1f} ms/step = '
              f'{bs/dt:6.2f} clips/s  '
              f'({flops/1e12:.2f} TFLOP/step, MFU {mfu:5.1%})',
              flush=True)

    import gc
    for bs in sizes:
        gc.collect()
        try:
            run_one(bs)
        except Exception as e:  # noqa: BLE001 - OOM/compile failures
            print(f'bs={bs:2d}: FAILED {type(e).__name__}: '
                  f'{str(e)[:3000]}', flush=True)


if __name__ == '__main__':
    main()

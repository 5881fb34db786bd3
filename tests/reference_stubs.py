"""Shared machinery for importing the torch reference from /root/reference.

The reference's modules read a module-level `config` singleton at import
time (AFSD/common/config.py:101) and import a CUDA extension
(AFSD/prop_pooling/boundary_pooling_op.py). Both are replaced here:
config with one canonical stub dict (module-level constants such as
AFSD.thumos14.BDNet's num_classes/os_head bind at first import, so every
test in a session must agree on these values), and the CUDA op with a
torch transliteration of the kernel spec
(boundary_max_pooling_kernel.cu:17-46).

`patch_cuda_to_cpu()` additionally turns `.cuda()` into a no-op so
reference *driver* scripts (e.g. AFSD/thumos14/test.py) run on host CPU.
"""

import sys
import types

import numpy as np
import torch

REF = '/root/reference'

# One canonical config for the session. BDNet-level constants
# (num_classes=16, os_head, evidence, clip_length=256) are frozen at the
# reference module's first import; the nested dicts stay mutable so
# driver tests can point dataset/testing paths at their tmp dirs.
STUB_CONFIG = {
    'dataset': {
        'num_classes': 16,
        'class_info_path': '',
        'training': {'clip_length': 256, 'clip_stride': 30,
                     'crop_size': 96},
        'testing': {'clip_length': 256, 'clip_stride': 128,
                    'crop_size': 96, 'video_info_path': '',
                    'video_data_path': ''},
    },
    'model': {'in_channels': 3, 'freeze_bn': True, 'freeze_bn_affine': True,
              'evidence': 'exp', 'dropout': 0.0, 'os_head': True,
              'use_edl': True, 'transformer': False},
    'testing': {'conf_thresh': 0.01, 'top_k': 5000, 'nms_thresh': 0.5,
                'nms_sigma': 0.5, 'fusion': False, 'checkpoint_path': '',
                'output_path': '', 'output_json': 'ref_detections.json'},
    'training': {},
}


class BoundaryMaxPooling(torch.nn.Module):
    """Channels-first transliteration of the CUDA forward
    (boundary_max_pooling_kernel.cu:17-46)."""

    def forward(self, x, segments):
        b, c, t = x.shape
        k = segments.shape[1]
        out = x.new_zeros(b, c, k)
        seg = segments.long()
        for n in range(b):
            for ki in range(k):
                for st in range(2):
                    l = int(seg[n, ki, st * 2].clamp(0, t - 1))
                    r = int(seg[n, ki, st * 2 + 1].clamp(0, t - 1))
                    r = max(r, l)
                    half = c // 2
                    sl = slice(st * half, (st + 1) * half)
                    out[n, sl, ki] = x[n, sl, l:r + 1].max(dim=-1).values
        return out


def install_reference_stubs():
    """Register /root/reference on sys.path with the config singleton
    and CUDA op stubbed out.

    Always (re)binds the CANONICAL config module and purges cached
    AFSD.* modules: other tests (e.g. tests/test_anet_parity.py) swap in
    their own config stub, and reference modules freeze whichever config
    they saw at first import — without the purge, a later
    `import AFSD.common.thumos_dataset` would bind the leftover ANet
    config and KeyError on THUMOS-only keys (order-dependent flake)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not hasattr(np, 'float'):
        # the reference predates numpy 1.24's alias removal
        np.float = float  # type: ignore[attr-defined]
    stale = (sys.modules.get('AFSD.common.config') is None
             or getattr(sys.modules['AFSD.common.config'], 'config', None)
             is not STUB_CONFIG)
    if stale:
        for mod in list(sys.modules):
            if mod == 'AFSD' or mod.startswith('AFSD.'):
                sys.modules.pop(mod)
        cfg_mod = types.ModuleType('AFSD.common.config')
        cfg_mod.config = STUB_CONFIG
        sys.modules['AFSD.common.config'] = cfg_mod
        bmp_mod = types.ModuleType('AFSD.prop_pooling.boundary_pooling_op')
        bmp_mod.BoundaryMaxPooling = BoundaryMaxPooling
        sys.modules['AFSD.prop_pooling.boundary_pooling_op'] = bmp_mod
    return STUB_CONFIG


def patch_cuda_to_cpu(monkeypatch):
    """Make reference driver code written for GPUs run on host CPU:
    `.cuda()` becomes identity on tensors and modules."""
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, 'cuda',
                        lambda self, *a, **k: self, raising=False)

"""Torch -> flax checkpoint conversion.

Maps the reference's torch state_dicts — the pretrained I3D backbone
(models/i3d_models/rgb_imagenet.pt, key layout from
AFSD/common/i3d_backbone.py) and full BDNet checkpoints
(checkpoint-{E}.ckpt, AFSD/thumos14/train.py:106-118) — onto this
framework's channels-last flax variable tree, so released reference
checkpoints run here bit-for-metric.

Layout transforms:
  conv3d (O, I, kT, kH, kW) -> (kT, kH, kW, I, O)
  conv1d (O, I, k)          -> (k, I, O)
  BN running stats/affine   -> 'constants' collection of FrozenBatchNorm
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

PathEntry = Tuple[str, Tuple[str, ...], Optional[str]]


def _t3(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t1(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


_BN_LEAF = {'weight': 'scale', 'bias': 'bias',
            'running_mean': 'mean', 'running_var': 'var'}

# GroupNorm module index inside reference nn.Sequential blocks is always
# conv_idx + 1; ReLU occupies the next slot (e.g. thumos14/BDNet.py:129-141).
_DECONV_SLOT = {'0': 'deconv_0', '3': 'deconv_1', '6': 'deconv_2'}
_DECONV_GN_SLOT = {'1': 'deconv_0', '4': 'deconv_1', '7': 'deconv_2'}


def map_i3d_key(key: str) -> Optional[PathEntry]:
    """Map one reference I3D state-dict key to (collection, path, xform)."""
    if key.endswith('num_batches_tracked'):
        return None
    m = re.fullmatch(
        r'(?P<ep>Conv3d_[\w]+|Mixed_\w+?)'
        r'(?:\.(?P<br>b0|b1a|b1b|b2a|b2b|b3b))?'
        r'\.(?P<mod>conv3d|bn)\.(?P<leaf>weight|bias|running_mean|running_var)',
        key)
    if m is None:
        return None  # logits head etc. — not used by the detector
    base = (m['ep'],) + ((m['br'],) if m['br'] else ())
    if m['mod'] == 'conv3d':
        return ('params', base + ('conv', 'kernel' if m['leaf'] == 'weight'
                                  else 'bias'),
                'conv3d' if m['leaf'] == 'weight' else None)
    return ('constants', base + ('bn', _BN_LEAF[m['leaf']]), None)


def map_pyramid_key(key: str, arch: str = 'thumos') -> Optional[PathEntry]:
    """Map one reference CoarsePyramid state-dict key (names from
    thumos14/BDNet.py:116-293, anet/BDNet.py:120-269) to our flax path.
    arch='anet': only pyramids.0 is a Unit3D (anet/BDNet.py:130-142)."""
    unit3d_levels = 2 if arch == 'thumos' else 1
    def conv1d(base: Tuple[str, ...], leaf: str) -> PathEntry:
        return ('params', base + ('conv', 'kernel' if leaf == 'weight'
                                  else 'bias'),
                'conv1d' if leaf == 'weight' else None)

    def gn(base: Tuple[str, ...], leaf: str) -> PathEntry:
        return ('params', base + ('scale' if leaf == 'weight' else 'bias',),
                None)

    # pyramids.{i}.{slot}.*
    m = re.fullmatch(r'pyramids\.(\d+)\.(\d+)\.(conv3d|conv1d)?\.?'
                     r'(weight|bias)', key)
    if m:
        i, slot, mod, leaf = m.groups()
        i = int(i)
        if i < unit3d_levels:  # Unit3D input convs
            if slot == '0':
                return ('params', (f'pyramid_{i}_conv', 'conv',
                                   'kernel' if leaf == 'weight' else 'bias'),
                        'conv3d' if leaf == 'weight' else None)
            return ('params', (f'pyramid_{i}_gn',
                               'scale' if leaf == 'weight' else 'bias'), None)
        if slot == '0':
            return conv1d((f'pyramid_{i}', 'conv'), leaf)
        return gn((f'pyramid_{i}', 'gn'), leaf)

    # towers: loc_tower.{blk}.{slot}... ; single extra Sequential nesting
    m = re.fullmatch(r'(loc_tower|conf_tower)\.(\d)\.(\d)\.?(conv1d)?\.?'
                     r'(weight|bias)', key)
    if m:
        tower, blk, slot, _, leaf = m.groups()
        base = (tower, f'block_{blk}')
        return conv1d(base + ('conv',), leaf) if slot == '0' \
            else gn(base + ('gn',), leaf)

    # deconv stack
    m = re.fullmatch(r'deconv\.(\d)\.?(conv1d)?\.?(weight|bias)', key)
    if m:
        slot, _, leaf = m.groups()
        if slot in _DECONV_SLOT:
            return conv1d((_DECONV_SLOT[slot], 'conv'), leaf)
        return gn((_DECONV_GN_SLOT[slot], 'gn'), leaf)

    # proposal branches: {which}.{sub}.{slot}...
    m = re.fullmatch(
        r'(loc_proposal_branch|conf_proposal_branch)\.'
        r'(cur_point_conv|lr_conv|roi_conv|proposal_conv)\.(\d)\.?'
        r'(conv1d)?\.?(weight|bias)', key)
    if m:
        which, sub, slot, _, leaf = m.groups()
        base = (which, sub)
        return conv1d(base + ('conv',), leaf) if slot == '0' \
            else gn(base + ('gn',), leaf)

    # simple heads
    m = re.fullmatch(
        r'(loc_head|conf_head|prop_loc_head|prop_conf_head|center_head|'
        r'actionness_head|prop_actionness_head)\.conv1d\.(weight|bias)', key)
    if m:
        return conv1d((m.group(1),), m.group(2))

    # RPL centers
    m = re.fullmatch(r'(conf_head|prop_conf_head)\.centers', key)
    if m:
        return ('params', (m.group(1), 'centers'), None)

    # per-level ScaleExp
    m = re.fullmatch(r'loc_heads\.(\d)\.scale', key)
    if m:
        return ('params', (f'loc_scale_{m.group(1)}', 'scale'), None)

    return None


def map_bdnet_key(key: str, arch: str = 'thumos') -> Optional[PathEntry]:
    if key.startswith('backbone._model.'):
        entry = map_i3d_key(key[len('backbone._model.'):])
        if entry is None:
            return None
        col, path, xf = entry
        return (col, ('backbone',) + path, xf)
    if key.startswith('coarse_pyramid_detection.'):
        entry = map_pyramid_key(key[len('coarse_pyramid_detection.'):],
                                arch)
        if entry is None:
            return None
        col, path, xf = entry
        return (col, ('pyramid',) + path, xf)
    return None


def map_anet_bdnet_key(key: str) -> Optional[PathEntry]:
    return map_bdnet_key(key, arch='anet')


_XFORMS = {'conv3d': _t3, 'conv1d': _t1, None: lambda w: w}


def _assign(tree: Dict[str, Any], path: Tuple[str, ...],
            value: np.ndarray) -> None:
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = value


def convert_state_dict(state_dict: Dict[str, Any], key_mapper
                       ) -> Dict[str, Dict[str, Any]]:
    """Convert a torch state dict into {'params': ..., 'constants': ...}."""
    out: Dict[str, Dict[str, Any]] = {'params': {}, 'constants': {}}
    for key, tensor in state_dict.items():
        entry = key_mapper(key)
        if entry is None:
            continue
        col, path, xf = entry
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, 'detach') else tensor)
        _assign(out[col], path, _XFORMS[xf](arr.astype(np.float32)))
    return out


def load_torch_file(path: str) -> Dict[str, Any]:
    import torch  # local import: torch is host-side conversion only
    return torch.load(path, map_location='cpu')


def convert_i3d_checkpoint(path: str) -> Dict[str, Dict[str, Any]]:
    """rgb_imagenet.pt -> backbone variables (under 'backbone' scope)."""
    sd = load_torch_file(path)
    tree = convert_state_dict(sd, map_i3d_key)
    return {col: {'backbone': sub} for col, sub in tree.items()}


def convert_bdnet_checkpoint(path: str) -> Dict[str, Dict[str, Any]]:
    """checkpoint-{E}.ckpt -> full BDNet variables."""
    sd = load_torch_file(path)
    return convert_state_dict(sd, map_bdnet_key)


def align_bn_collections(loaded: Dict[str, Dict[str, Any]],
                         params_template: Dict[str, Any]
                         ) -> Dict[str, Dict[str, Any]]:
    """Move converted BN gamma/beta ('scale'/'bias') from 'constants'
    into 'params' wherever the template holds them there (models built
    with freeze_bn_affine: false train the BN affine; torch checkpoints
    are collection-agnostic). Returns a new {'params', 'constants'}."""
    import copy as _copy
    out = {'params': _copy.deepcopy(loaded.get('params', {})),
           'constants': _copy.deepcopy(loaded.get('constants', {}))}

    def rec(tmpl, par, con):
        for k, v in tmpl.items():
            if not isinstance(v, dict):
                continue
            if (set(v) >= {'scale', 'bias'} and isinstance(con.get(k), dict)
                    and 'mean' in con[k]):
                sub = par.get(k, {})
                moved = False
                for leaf in ('scale', 'bias'):
                    if leaf in con[k] and leaf not in sub:
                        sub[leaf] = con[k].pop(leaf)
                        moved = True
                if moved or k in par:
                    par[k] = sub
            elif k in par or k in con:
                # recurse into a detached node and only attach it if the
                # recursion actually moved something — never grow empty
                # dict nodes along constants-only paths
                sub = par.get(k, {})
                rec(v, sub, con.get(k, {}))
                if sub or k in par:
                    par[k] = sub

    rec(params_template, out['params'], out['constants'])
    return out


def merge_variables(template: Dict[str, Any], loaded: Dict[str, Any],
                    strict: bool = False) -> Dict[str, Any]:
    """Overlay loaded arrays onto an init-template tree, shape-checked."""
    import jax.numpy as jnp

    def rec(tmpl, got, prefix):
        out = {}
        for k, v in tmpl.items():
            if isinstance(v, dict):
                out[k] = rec(v, got.get(k, {}), prefix + (k,))
            elif k in got:
                arr = got[k]
                if tuple(arr.shape) != tuple(v.shape):
                    raise ValueError(
                        f'{"/".join(prefix + (k,))}: shape {arr.shape} vs '
                        f'template {v.shape}')
                out[k] = jnp.asarray(arr, dtype=v.dtype)
            else:
                if strict:
                    raise KeyError('/'.join(prefix + (k,)))
                out[k] = v
        return out

    return rec(template, loaded, ())

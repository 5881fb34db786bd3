"""Device-side detection decoding for a batch of sliding windows.

Reference: decode_predictions / parse_output (AFSD/thumos14/test.py:79-140),
which run per-window on GPU then hop to CPU. Here the whole window batch
(W, P, ...) decodes in one jitted graph; only the final per-class NMS
gather leaves the device.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from opental_tpu.models.bdnet import dirichlet_expected_prob

Array = jax.Array


class DecodedWindows(NamedTuple):
    segments: Array      # (W, P, 2) in clip-frame units, clamped [0, L]
    scores: Array        # (W, P, K) fused class scores
    uncertainty: Optional[Array]   # (W, P) mean EDL vacuity
    actionness: Optional[Array]    # (W, P) mean sigmoid actionness


def fuse_streams(out: Dict[str, Array], flow_out: Dict[str, Array]
                 ) -> Dict[str, Array]:
    """RGB+flow late fusion by head-wise averaging (test.py:91-108)."""
    fused = dict(out)
    for k in ('loc', 'prop_loc', 'conf', 'prop_conf', 'center', 'act',
              'prop_act', 'unct', 'prop_unct'):
        if out.get(k) is not None and flow_out.get(k) is not None:
            fused[k] = (out[k] + flow_out[k]) / 2.0
    return fused


def decode_windows(out: Dict[str, Array], clip_length: int,
                   use_edl: bool = False, os_head: bool = False,
                   score_func: str = 'softmax', evidence: str = 'exp',
                   negate_conf: bool = False) -> DecodedWindows:
    """Fuse refined offsets into coarse locs and compose scores
    (test.py:112-140). All shapes (W, P, ...)."""
    loc, prop_loc = out['loc'], out['prop_loc']
    conf, prop_conf = out['conf'], out['prop_conf']
    if negate_conf:          # GCPL scores are negative distances (:85-87)
        conf, prop_conf = -conf, -prop_conf
    center = out['center'][..., 0]
    priors = out['priors'][None, :, :1]              # (1, P, 1)

    pre_w = loc[..., :1] + loc[..., 1:]
    loc = 0.5 * pre_w * prop_loc + loc
    segments = jnp.concatenate(
        [priors * clip_length - loc[..., :1],
         priors * clip_length + loc[..., 1:]], axis=-1)
    segments = jnp.clip(segments, 0.0, clip_length)

    uncertainty = None
    if use_edl:
        uncertainty = (out['unct'] + out['prop_unct']) / 2.0

    actionness = None
    if os_head:
        actionness = (jax.nn.sigmoid(out['act'][..., 0])
                      + jax.nn.sigmoid(out['prop_act'][..., 0])) / 2.0

    if score_func == 'dirichlet':
        conf = dirichlet_expected_prob(conf, evidence)
        prop_conf = dirichlet_expected_prob(prop_conf, evidence)
    else:
        conf = jax.nn.softmax(conf, axis=-1)
        prop_conf = jax.nn.softmax(prop_conf, axis=-1)

    scores = (conf + prop_conf) / 2.0 * jax.nn.sigmoid(center)[..., None]
    if os_head:
        scores = scores * actionness[..., None]
    return DecodedWindows(segments, scores, uncertainty, actionness)

"""OpenMax open-set baseline: MAV extraction + Weibull recalibration.

Reference pipeline (AFSD/thumos14/test_openmax.py + openmax.py):
 1. extract per-class Mean Activation Vectors and eucos distances of
    positively-matched train-clip features (test_openmax.py:248-327);
 2. Weibull-fit the top-`tailsize` distance tail per class with libMR
    (:331-354);
 3. at test time, recalibrate per-proposal known-class logits, moving
    Weibull-weighted mass to an explicit unknown class that takes the
    background column's slot (openmax.py:42-86, test_openmax.py:158-164).

The recalibration is vectorized over proposals (the reference loops in
python per proposal).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from opental_tpu.openset.libmr import MR


def eucos_dist(mav: np.ndarray, feats: np.ndarray) -> np.ndarray:
    """Euclidean/200 + cosine distance (openmax.py:7-9), vectorized.
    mav: (D,); feats: (N, D) -> (N,)."""
    feats = np.atleast_2d(feats)
    eu = np.linalg.norm(feats - mav[None, :], axis=1) / 200.0
    denom = (np.linalg.norm(feats, axis=1) * np.linalg.norm(mav))
    cos = 1.0 - (feats @ mav) / np.maximum(denom, 1e-12)
    return eu + cos


class OpenMax:
    """Weibull-calibrated open-set probability layer.

    weibull_model: {class_name: {'mean_vec': (D,), 'model': [MR]}}.
    """

    def __init__(self, weibull_model: Dict[str, dict], rank: int = 1):
        self.weibull_model = weibull_model
        self.class_names = list(weibull_model.keys())
        self.num_cls = len(self.class_names)
        self.rank = rank

    def __call__(self, logits: np.ndarray, feats: np.ndarray) -> np.ndarray:
        """logits: (N, K) known-class logits; feats: (N, D).
        Returns (N, K+1) probabilities, unknown mass first
        (openmax.py:21-86)."""
        logits = np.asarray(logits, np.float64)
        feats = np.asarray(feats, np.float64)
        n, k = logits.shape
        assert k == self.num_cls

        # ranked alpha weights: top-`rank` classes by logit get weight
        # ((rank+1)-i)/rank (openmax.py:47-52)
        alpharank = min(self.num_cls, self.rank)
        order = np.argsort(logits, axis=1)[:, ::-1]        # (N, K) desc
        alpha = np.zeros_like(logits)
        rows = np.arange(n)
        for i in range(alpharank):
            alpha[rows, order[:, i]] = (alpharank - i) / float(alpharank)

        # per-class Weibull rejection probability of each feature; a
        # class with no fitted model (no positive train matches — see
        # weibull_fitting) contributes wscore 0: its logits pass through
        # unrecalibrated and it moves no mass to the unknown slot
        wscores = np.zeros((n, k))
        for ci, name in enumerate(self.class_names):
            entry = self.weibull_model[name]
            if entry['model'][0] is None:
                continue
            dist = eucos_dist(np.asarray(entry['mean_vec'], np.float64),
                              feats)
            wscores[:, ci] = entry['model'][0].w_score_vector(dist)

        modified = logits * (1.0 - wscores * alpha)
        unknown_mass = logits - modified                   # (N, K)
        denom = (np.sum(np.exp(modified), axis=1)
                 + np.exp(np.sum(unknown_mass, axis=1)))   # (N,)
        probs_known = np.exp(modified) / denom[:, None]
        prob_unknown = np.exp(np.sum(unknown_mass, axis=1)) / denom
        return np.concatenate([prob_unknown[:, None], probs_known], axis=1)


def accumulate_mavs(features: Dict[str, List[np.ndarray]]
                    ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Per-class (MAV, eucos distances) from collected feature lists
    (test_openmax.py:312-327)."""
    out = {}
    for name, feat_list in features.items():
        if not feat_list:
            continue
        feats = np.stack(feat_list, axis=0)
        mav = feats.mean(axis=0)
        out[name] = (mav, eucos_dist(mav, feats))
    return out


def save_mav_dist(mav_dist_dir: str,
                  coarse: Dict[str, Tuple[np.ndarray, np.ndarray]],
                  refined: Dict[str, Tuple[np.ndarray, np.ndarray]],
                  class_names: Optional[Sequence[str]] = None) -> None:
    """One npz per class. A class missing one stage (no positive matches
    — the reference would crash on np.stack of an empty list,
    test_openmax.py:318-320) falls back to the other stage's MAV so
    OpenMax stays shape-consistent; a class in `class_names` missing
    BOTH stages gets a placeholder npz (zero MAV, empty distance tail)
    that weibull_fitting turns into a no-op recalibration entry."""
    os.makedirs(mav_dist_dir, exist_ok=True)
    present = set(coarse) | set(refined)
    for name in present:
        fallback = coarse.get(name) or refined.get(name)
        mav, dist = coarse.get(name, fallback)
        mav_p, dist_p = refined.get(name, fallback)
        np.savez(os.path.join(mav_dist_dir, f'{name}.npz'), mav=mav,
                 dist=dist, mav_prop=mav_p, dist_prop=dist_p)
    if class_names and present:
        dim = next(iter((coarse or refined).values()))[0].shape[0]
        zero = np.zeros((dim,))
        empty = np.zeros((0,))
        for name in set(class_names) - present:
            np.savez(os.path.join(mav_dist_dir, f'{name}.npz'), mav=zero,
                     dist=empty, mav_prop=zero, dist_prop=empty)


def weibull_fitting(mav_dist_dir: str, class_names: Sequence[str],
                    tailsize: int = 20
                    ) -> Tuple[Dict[str, dict], Dict[str, dict]]:
    """Fit per-class Weibull tails on the saved distances
    (test_openmax.py:331-354)."""
    weibull_model: Dict[str, dict] = {}
    weibull_prop_model: Dict[str, dict] = {}
    for name in class_names:
        data = np.load(os.path.join(mav_dist_dir, f'{name}.npz'),
                       allow_pickle=True)
        for model, mav_key, dist_key in (
                (weibull_model, 'mav', 'dist'),
                (weibull_prop_model, 'mav_prop', 'dist_prop')):
            tail = np.sort(data[dist_key])[-tailsize:]
            if tail.size == 0:
                # placeholder entry (no positive matches): recalibration
                # is a no-op for this class (OpenMax.__call__)
                model[name] = {'mean_vec': data[mav_key], 'model': [None]}
                continue
            mr = MR()
            mr.fit_high(tail, len(tail))
            model[name] = {'mean_vec': data[mav_key], 'model': [mr]}
    return weibull_model, weibull_prop_model


def extract_positive_features(model, variables, batches, clip_length: int,
                              idx_to_class: Dict[int, str],
                              overlap_thresh: float = 0.5
                              ) -> Tuple[Dict[str, List[np.ndarray]],
                                         Dict[str, List[np.ndarray]]]:
    """Run the net with get_feat over train clips, keep conf-tower
    features of positively-matched priors, per class
    (test_openmax.py:268-311). `batches` yields dicts with
    clips/truths/labels/gt_mask."""
    import jax
    import jax.numpy as jnp

    from opental_tpu.losses.multisegment import match_targets

    @jax.jit
    def forward(variables, clips):
        if clips.dtype == jnp.uint8:
            # raw uint8 staging (4x less transfer); dtype is a static
            # trace property, so f32 batches keep a no-op graph —
            # same device-side normalize as train/step.device_ingest
            clips = (clips.astype(jnp.float32) / 255.0) * 2.0 - 1.0
        out = model.apply(variables, clips, get_feat=True)
        return (out['loc'], out['priors'], out['conf_feat'],
                out['prop_conf_feat'])

    coarse: Dict[str, List[np.ndarray]] = {n: [] for n in
                                           idx_to_class.values()}
    refined: Dict[str, List[np.ndarray]] = {n: [] for n in
                                            idx_to_class.values()}
    for batch in batches:
        loc, priors, feat, prop_feat = forward(variables,
                                               jnp.asarray(batch['clips']))
        m = match_targets(priors, loc, jnp.asarray(batch['truths']),
                          jnp.asarray(batch['labels']),
                          jnp.asarray(batch['gt_mask']), clip_length,
                          overlap_thresh)
        conf_t = np.asarray(m.conf_t).reshape(-1)
        prop_conf_t = np.asarray(m.prop_conf_t).reshape(-1)
        feat = np.asarray(feat).reshape(-1, feat.shape[-1])
        prop_feat = np.asarray(prop_feat).reshape(-1, prop_feat.shape[-1])
        for labels, feats, store in ((conf_t, feat, coarse),
                                     (prop_conf_t, prop_feat, refined)):
            pos = labels > 0
            for cl, f in zip(labels[pos], feats[pos]):
                store[idx_to_class[int(cl)]].append(f)
    return coarse, refined

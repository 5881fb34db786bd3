"""End-to-end workflow test on a synthetic dataset: train a step,
checkpoint, run window-batched inference to JSON, evaluate open-set
metrics. Slow (CPU jit of the full train step)."""

import json
import os

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_train_test_eval_workflow(tmp_path):
    from opental_tpu.config import load_config
    from opental_tpu.eval.detection import DetectionEvaluator
    from opental_tpu.tools.test import run_test
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.loop import train
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    root = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(root, clip_length=128, crop_size=32)
    cfg = load_config(cfg_path)

    state = train(cfg, max_steps_per_epoch=1)
    assert int(state.step) >= 1
    metrics_file = os.path.join(cfg.training['checkpoint_path'],
                                'metrics.jsonl')
    assert os.path.exists(metrics_file)

    path = ckpt.save(cfg.training['checkpoint_path'], 1, state,
                     jax.random.PRNGKey(0))
    assert os.path.isdir(path)

    # resume: the template-restore branch (loop.py resume path) — the
    # saved payload carries rng_key, and the restore template must
    # mirror it (round-5 fix: a template without rng_key made orbax
    # raise a tree-structure mismatch, so resume NEVER worked)
    resume_cfg = cfg.clone()
    resume_cfg['training']['resume'] = 1
    resume_cfg['training']['max_epoch'] = 2
    resumed = train(resume_cfg, max_steps_per_epoch=1)
    assert int(resumed.step) == int(state.step) + 1
    w0 = jax.tree_util.tree_leaves(state.params)[0]
    w1 = jax.tree_util.tree_leaves(resumed.params)[0]
    assert not np.array_equal(np.asarray(w0), np.asarray(w1)), \
        'resumed epoch took no optimizer step'

    out_path = run_test(cfg)
    payload = json.load(open(out_path))
    assert set(payload) == {'version', 'results', 'external_data'}
    assert len(payload['results']) == 2  # both test videos present

    ev = DetectionEvaluator(
        os.path.join(root, 'annotations', 'gt_open.json'), out_path,
        os.path.join(root, 'annotations', 'Class_Index_Known.txt'),
        tiou_thresholds=np.array([0.3, 0.5]), ood_scoring='uncertainty',
        subset=['test'], openset=True)
    ev.pre_evaluate()
    auc_roc, auc_pr, far = ev.evaluate('AUC')
    osdr = ev.evaluate('OSDR')
    assert np.all(np.isfinite(auc_roc)) and np.all(np.isfinite(osdr))

    # search_param sweep from the raw-output cache (any post-network
    # stage re-runs per candidate, search_param.py:112-150)
    from opental_tpu.tools.search_param import (cache_raw_outputs,
                                                evaluate_candidate)
    cache_dir = os.path.join(root, 'output', 'raw_cache')
    names = cache_raw_outputs(cfg, cache_dir)
    assert all(os.path.exists(os.path.join(cache_dir, n + '.npz'))
               for n in names)
    gt = os.path.join(root, 'annotations', 'gt_open.json')
    # closed-set sweep scoring needs the known-classes GT (the reference
    # points search_param at the split-filtered GT; the open GT carries
    # unknown-class segments the closed evaluator must never see)
    from opental_tpu.openset.splits import filter_gt_json, load_class_names
    known = {ln.split(maxsplit=1)[1] for ln in load_class_names(
        os.path.join(root, 'annotations', 'Class_Index_Known.txt'))}
    import json as _json
    all_labels = {a['label']
                  for v in _json.load(open(gt))['database'].values()
                  for a in v['annotations']}
    gt_known = os.path.join(root, 'annotations', 'gt_known.json')
    filter_gt_json(gt, gt_known, sorted(all_labels - known))
    for sigma in (0.5, 0.9):
        score = evaluate_candidate(cfg, cache_dir, names, gt_known,
                                   os.path.join(root, 'output'), sigma)
        assert np.isfinite(score)

    # analysis depth: prior-level stage distributions + final-proposal
    # distributions (draw_distribution.py / analyze_actionness.py sets)
    from opental_tpu.tools.analysis import (actionness_report,
                                            distribution_report,
                                            stage_buckets)
    cls_idx = os.path.join(root, 'annotations', 'Class_Index_Known.txt')
    stages = stage_buckets(cfg, cache_dir, gt, cls_idx, 'uncertainty')
    n_priors = sum(len(stages['coarse'][b]) for b in stages['coarse'])
    assert n_priors > 0
    assert len(stages['refined']['known']) <= len(stages['coarse']['known'])
    fig_dir = os.path.join(root, 'output', 'figures')
    written = distribution_report(cfg, cache_dir, gt, cls_idx, fig_dir,
                                  target='uncertainty',
                                  pred_json=out_path)
    written += actionness_report(cfg, cache_dir, gt, cls_idx, fig_dir)
    from opental_tpu.tools.analysis import per_class_report
    pc = per_class_report(cfg, cache_dir, gt, cls_idx, fig_dir,
                          target='uncertainty')
    written += pc
    # per-class depth: the summary CSV carries a row per (class, stage)
    csv_path = [w for w in pc if w.endswith('per_class_stats.csv')][0]
    with open(csv_path) as f:
        rows = [ln.split(',') for ln in f.read().splitlines()[1:]]
    stages = {r[1] for r in rows}
    assert stages == {'coarse', 'refined'}
    assert any(int(r[2]) > 0 for r in rows), 'no class got any priors'
    assert all(os.path.exists(w) for w in written) and len(written) >= 12


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    """Save/restore preserves params and optimizer state exactly."""
    import jax.numpy as jnp
    import optax

    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer

    params = {'w': jnp.arange(6.0).reshape(2, 3),
              'nested': {'b': jnp.ones(4)}}
    tx = make_optimizer(1e-4, 1e-3)
    state = TrainState(params=params, constants={'c': jnp.zeros(2)},
                       opt_state=tx.init(params),
                       edl_state=EDLState.create(EDLConfig(num_classes=4)),
                       step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / 'ckpts')
    ckpt.save(path, 12, state, jax.random.PRNGKey(3))
    assert ckpt.latest_epoch(path) == 12

    restored, epoch, rng = ckpt.restore(path)
    assert epoch == 12
    np.testing.assert_array_equal(np.asarray(rng),
                                  np.asarray(jax.random.PRNGKey(3)))
    got = restored['params'] if isinstance(restored, dict) \
        else restored.params
    np.testing.assert_array_equal(np.asarray(got['w']),
                                  np.asarray(params['w']))

    # template branch (the loop's resume path): the template must
    # mirror the saved payload's rng_key or orbax raises a structure
    # mismatch (round-5 fix; previously resume always crashed)
    template = TrainState(params=jax.tree_util.tree_map(jnp.zeros_like,
                                                        params),
                          constants={'c': jnp.zeros(2)},
                          opt_state=tx.init(params),
                          edl_state=EDLState.create(
                              EDLConfig(num_classes=4)),
                          step=jnp.asarray(0, jnp.int32))
    restored_t, epoch_t, rng_t = ckpt.restore(path, 12, template)
    assert epoch_t == 12 and rng_t is not None
    np.testing.assert_array_equal(np.asarray(restored_t.params['w']),
                                  np.asarray(params['w']))
    np.testing.assert_array_equal(
        np.asarray(restored_t.step), 7)

    # and a checkpoint saved WITHOUT rng_key still template-restores
    path2 = str(tmp_path / 'ckpts_norng')
    ckpt.save(path2, 2, state)
    _, epoch2, rng2 = ckpt.restore(path2, 2, template)
    assert epoch2 == 2 and rng2 is None

"""Shipped-config integrity: generator <-> checked-in YAMLs <-> factory.

The config matrix mirrors the reference's configs/*.yaml set; this keeps
the generated files in sync with configs/generate.py and round-trips the
closed-set base config (reference configs/thumos14.yaml) through the
factory.
"""

import importlib.util
import os

import pytest
import yaml

from opental_tpu import factory
from opental_tpu.config import load_config

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIGS = os.path.join(HERE, '..', 'configs')


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        'cfg_generate', os.path.join(CONFIGS, 'generate.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_checked_in_configs_match_generator():
    """Every checked-in YAML equals what configs/generate.py would write
    (guards against hand-edits drifting from the generator)."""
    gen = _load_generator()
    for name, cfg in gen.CONFIGS.items():
        with open(os.path.join(CONFIGS, name)) as f:
            assert yaml.safe_load(f) == cfg, name
    for name, overrides in gen.ABLATIONS.items():
        want = gen.build(gen._FINAL, overrides)
        with open(os.path.join(CONFIGS, 'ablations', name)) as f:
            assert yaml.safe_load(f) == want, name


def test_closed_set_base_config_roundtrip():
    """configs/thumos14.yaml is the plain closed-set AFSD baseline
    (reference configs/thumos14.yaml): 21 classes, focal loss, no
    open-set head/EDL, closed (non-split) annotation paths."""
    cfg = load_config(os.path.join(CONFIGS, 'thumos14.yaml'))
    flags = factory.model_flags(cfg)
    assert flags['num_classes'] == 21
    assert not flags['os_head'] and not flags['use_edl']
    assert not flags['use_rpl']
    assert factory.cls_loss_type(cfg) == 'focal'
    assert cfg.get_path('training.max_epoch') == 16
    assert cfg.get_path('training.focal_loss') is True
    # closed-set: no open annotation file, no split templating anywhere
    assert cfg.get_path('dataset.testing.video_anno_open_path') is None
    for key in ('dataset.class_info_path',
                'dataset.training.video_anno_path',
                'dataset.testing.video_anno_path',
                'training.checkpoint_path', 'testing.output_path'):
        assert '{id' not in str(cfg.get_path(key)), key
    model = factory.build_model(cfg)
    assert model.num_classes == 21 and not model.os_head
    loss_cfg = factory.build_loss_config(cfg)
    assert loss_cfg.cls_type == 'focal'
    assert loss_cfg.num_classes == 21  # closed set keeps background col


def test_closed_set_matches_reference_schema():
    """Field-for-field schema parity with the reference's closed-set
    config (/root/reference/configs/thumos14.yaml): same key tree; same
    values for every key that is not an artifact path."""
    ref_path = '/root/reference/configs/thumos14.yaml'
    if not os.path.exists(ref_path):
        pytest.skip('reference configs unavailable')
    with open(ref_path) as f:
        ref = yaml.safe_load(f)
    with open(os.path.join(CONFIGS, 'thumos14.yaml')) as f:
        ours = yaml.safe_load(f)

    def key_tree(d, prefix=''):
        out = set()
        for k, v in d.items():
            out.add(prefix + k)
            if isinstance(v, dict):
                out |= key_tree(v, prefix + k + '.')
        return out

    assert key_tree(ours) == key_tree(ref)

    skip_exact = {  # checkpoint naming scheme is ours (latest symlink)
        'testing.checkpoint_path',
    }

    def walk(ref_d, ours_d, prefix=''):
        for k, v in ref_d.items():
            dotted = prefix + k
            if isinstance(v, dict):
                walk(v, ours_d[k], dotted + '.')
            elif dotted not in skip_exact:
                assert ours_d[k] == v, dotted

    walk(ref, ours)

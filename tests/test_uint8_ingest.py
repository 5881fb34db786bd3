"""uint8 train ingest: raw uint8 clips shipped to device, normalized
inside the jitted step (train/step.device_ingest), vs the
host-normalized pipeline (transforms.normalize_clip,
thumos_dataset.py:263). The transform reordering is bit-exact: the only
transform downstream of normalization is the SSL cut-paste augment,
which is pure frame-block moves (thumos_dataset.py:187-229), so
paste-then-normalize == normalize-then-paste — asserted bitwise with
eager device_ingest below. Under jit, XLA lowers the /255 constant
division to a reciprocal multiply (measured: <=1 ulp per element), so
the jitted-train-step comparison uses a few-ulp tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.train.step import device_ingest


def _matched_datasets(tmp_path):
    from opental_tpu.config import load_config
    from opental_tpu.data.thumos import (ThumosTrainDataset, get_video_anno,
                                         get_video_info)
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    cfg = load_config(make_synthetic_dataset(
        str(tmp_path / 'synth'), clip_length=128, crop_size=32))
    infos = get_video_info(cfg.get_path('dataset.training.video_info_path'))
    annos = get_video_anno(infos,
                           cfg.get_path('dataset.training.video_anno_path'),
                           cfg.get_path('dataset.class_info_path'))

    def make(uint8):
        return ThumosTrainDataset(
            cfg.get_path('dataset.training.video_data_path'), infos, annos,
            clip_length=128, crop_size=32, seed=7, uint8_ingest=uint8)

    return make(False), make(True)


def test_uint8_batch_matches_host_normalized(tmp_path):
    """Same seed, same RNG stream: the uint8 dataset yields raw uint8
    clips whose device normalization is bit-identical to the host
    pipeline, and every non-clip key is untouched."""
    ds_f32, ds_u8 = _matched_datasets(tmp_path)
    b32 = next(ds_f32.batches(2, shuffle=True))
    bu8 = next(ds_u8.batches(2, shuffle=True))

    assert bu8['clips'].dtype == np.uint8
    assert bu8['ssl_clips'].dtype == np.uint8
    assert b32['clips'].dtype == np.float32

    ingested = device_ingest({k: jnp.asarray(v) for k, v in bu8.items()})
    np.testing.assert_array_equal(np.asarray(ingested['clips']),
                                  b32['clips'])
    np.testing.assert_array_equal(np.asarray(ingested['ssl_clips']),
                                  b32['ssl_clips'])
    for k in ('truths', 'labels', 'gt_mask', 'scores', 'ssl_props',
              'ssl_flags'):
        np.testing.assert_array_equal(bu8[k], b32[k], err_msg=k)


def _matched_anet_datasets(tmp_path):
    from opental_tpu.config import load_config
    from opental_tpu.data.anet import AnetTrainDataset
    from opental_tpu.utils.synthetic import make_synthetic_anet_dataset

    cfg = load_config(make_synthetic_anet_dataset(
        str(tmp_path / 'anet'), n_train=3, clip_length=128, crop_size=32))

    def make(uint8):
        return AnetTrainDataset(
            cfg.get_path('dataset.training.video_info_path'),
            cfg.get_path('dataset.training.video_data_path'),
            clip_length=128, crop_size=32, seed=9, uint8_ingest=uint8)

    return make(False), make(True)


def test_anet_uint8_batch_matches_host_normalized(tmp_path):
    """ANet uint8 ingest: pad-127.5 frames ride as pad_masks companions
    (incl. through the SSL cut-paste moves); eager device_ingest is
    bit-identical to the host f32 pipeline. Synthetic ANet videos are
    mostly shorter than clip_length, so padding is exercised."""
    ds_f32, ds_u8 = _matched_anet_datasets(tmp_path)
    b32 = next(ds_f32.batches(3, shuffle=True))
    bu8 = next(ds_u8.batches(3, shuffle=True))

    assert bu8['clips'].dtype == np.uint8
    assert bu8['pad_masks'].any(), 'no padded video sampled'
    # SSL moves must have relocated at least the mask arrays coherently
    assert bu8['ssl_pad_masks'].shape == bu8['pad_masks'].shape

    ingested = device_ingest({k: jnp.asarray(v) for k, v in bu8.items()})
    assert 'pad_masks' not in ingested and 'ssl_pad_masks' not in ingested
    np.testing.assert_array_equal(np.asarray(ingested['clips']),
                                  b32['clips'])
    np.testing.assert_array_equal(np.asarray(ingested['ssl_clips']),
                                  b32['ssl_clips'])
    for k in ('truths', 'labels', 'gt_mask', 'scores', 'ssl_props',
              'ssl_flags'):
        np.testing.assert_array_equal(bu8[k], b32[k], err_msg=k)


def test_device_ingest_passthrough():
    """f32 batches trace to a no-op; non-clip keys never touched."""
    batch = {'clips': jnp.ones((1, 4, 2, 2, 3), jnp.float32),
             'labels': jnp.arange(3)}
    out = device_ingest(batch)
    assert out['clips'] is batch['clips']
    assert out['labels'] is batch['labels']


@pytest.mark.slow
def test_train_step_uint8_equals_f32():
    """The jitted train step consumes a uint8 batch directly (wiring
    guard for the device_ingest call) and reproduces the f32 batch's
    metrics to a few ulps (jit /255 lowering, see module docstring)."""
    from test_train_step import make_cfg, tiny_batch, tiny_model

    from opental_tpu.losses.edl import EDLState
    from opental_tpu.train.step import (LossWeights, TrainState,
                                        make_optimizer, make_train_step)

    model = tiny_model()
    batch = tiny_batch(batch_size=1, seed=5)
    # quantize the f32 clips to an exact uint8<->normalized pair
    rng = np.random.RandomState(11)
    for k in ('clips', 'ssl_clips'):
        raw = rng.randint(0, 256, batch[k].shape, dtype=np.uint8)
        batch[k] = jnp.asarray(
            (raw.astype(np.float32) / 255.0) * 2.0 - 1.0)
        batch[k + '_raw'] = raw
    u8_batch = dict(batch)
    for k in ('clips', 'ssl_clips'):
        u8_batch[k] = jnp.asarray(batch.pop(k + '_raw'))
        del u8_batch[k + '_raw']

    cfg = make_cfg()
    tx = make_optimizer(1e-5, 1e-3)
    variables = model.init(jax.random.PRNGKey(0), batch['clips'])
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(cfg.edl))
    step_fn = jax.jit(make_train_step(model, cfg, LossWeights(), tx))

    _, m32 = step_fn(state, batch, jnp.asarray(1))
    _, mu8 = step_fn(state, u8_batch, jnp.asarray(1))
    for k in m32:
        # <=1 ulp per input element from XLA's jitted /255 lowering
        # (reciprocal multiply); everything downstream is identical ops
        # on inputs that differ by at most that ulp.
        np.testing.assert_allclose(np.asarray(m32[k]),
                                   np.asarray(mu8[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_u8_staging_rejects_float_frames():
    """uint8-staging intakes raise on float frames instead of silently
    truncating them into the np.uint8 buffers (127.5 -> 127, which
    normalizes to -0.0039 instead of the reference pad's exact 0.0).
    Float-padded videos must ship raw uint8 with a padded sample_count
    (tools/test_cross_data.py _anet_item_raw)."""
    from opental_tpu.infer.pipeline import stack_windows_u8

    f32 = np.full((16, 8, 8, 3), 127.5, np.float32)
    with pytest.raises(TypeError):
        stack_windows_u8(f32, [0], 16)
    u8 = np.zeros((16, 8, 8, 3), np.uint8)
    out, valid = stack_windows_u8(u8, [0], 16)
    assert out.dtype == np.uint8 and valid[0] == 16

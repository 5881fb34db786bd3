"""AOT serving export: the serialized artifact must reproduce the live
model's decoded outputs exactly, self-contained (weights baked in)."""

import os

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.tools.export import (build_inference_fn,
                                          export_model, load_exported)
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    root = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(root, clip_length=128, crop_size=32)
    cfg = load_config(cfg_path, overrides={
        'model.compute_dtype': 'float32'})

    # random-init checkpoint
    from opental_tpu import factory
    model = factory.build_model(cfg, frame_num=128)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 128, 32, 32, 3), np.float32))
    tx = make_optimizer(1e-5, 1e-3)
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(EDLConfig(num_classes=4)))
    ckpt.save(cfg.training['checkpoint_path'], 1, state,
              jax.random.PRNGKey(0))

    out_path = str(tmp_path / 'model.jaxexp')
    export_model(cfg, out_path, window_batch=2)
    assert os.path.getsize(out_path) > 1_000_000  # weights baked in

    serve, _ = build_inference_fn(cfg, window_batch=2)
    loaded = load_exported(out_path)
    clips = np.random.RandomState(0).randn(2, 128, 32, 32, 3
                                           ).astype(np.float32)
    want = serve(clips)
    got = loaded(clips)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)

    # portable export (explicit platform list without the current
    # backend's default) routes the boundary pool through the XLA twin
    # (a Pallas call has no portable lowering) — must still match.
    port_path = str(tmp_path / 'model_portable.jaxexp')
    export_model(cfg, port_path, window_batch=2, platforms=('cpu',))
    got_port = load_exported(port_path)(clips)
    for k in want:
        np.testing.assert_allclose(np.asarray(got_port[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)

    # uint8 serving contract: (clips_u8, frames_valid) artifact with
    # normalization baked in == the f32 artifact on the normalized twin
    # (ingest_windows semantics incl. the zero tail past frames_valid)
    u8_path = str(tmp_path / 'model_u8.jaxexp')
    export_model(cfg, u8_path, window_batch=2, uint8_ingest=True)
    rng = np.random.RandomState(1)
    clips_u8 = rng.randint(0, 255, (2, 128, 32, 32, 3), dtype=np.uint8)
    valid = np.asarray([128, 50], np.int32)
    norm = (clips_u8.astype(np.float32) / 255.0) * 2.0 - 1.0
    norm[1, 50:] = 0.0
    want_u8 = serve(norm)
    got_u8 = load_exported(u8_path)(clips_u8, valid)
    for k in want_u8:
        np.testing.assert_allclose(np.asarray(got_u8[k]),
                                   np.asarray(want_u8[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)

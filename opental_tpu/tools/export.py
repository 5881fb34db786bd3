"""AOT model export for serving: `python -m opental_tpu.tools.export
<cfg.yaml> --out model.jaxexp [--window_batch 128] [--platforms tpu,cpu]`.

Serializes the jitted window-batched forward+decode (weights baked in as
constants) to a self-contained StableHLO artifact via jax.export. A
serving process deserializes it with `load_exported` and calls it on
(W, T, H, W, C) f32 clip batches — no model code, flax, or checkpoint
loading needed at serving time, and the artifact is
version/platform-checked by jax on load.

Beyond-reference capability (the torch reference deploys by shipping the
training repo + .ckpt files; here deployment is one file + jax). The
exported function is exactly bench.py's measured inference graph
(forward + on-device decode); host soft-NMS composes downstream via
ops/nms.soft_nms_numpy or the device-post pipeline.
"""

from __future__ import annotations

import argparse
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from opental_tpu import factory
from opental_tpu.config import Config, load_config
from opental_tpu.infer.decode import decode_windows


def build_inference_fn(cfg: Config, window_batch: int = 128,
                       dtype=None, uint8_ingest: bool = False) -> Callable:
    """Jitted clips -> DecodedWindows closure with weights baked in.

    uint8_ingest=True makes the serving signature
    (clips_u8 uint8, frames_valid int32[W]) with normalization inside
    the artifact — 4x less host->serving-process transfer, the same
    contract as the packed/streaming pipelines (ingest_windows)."""
    te = cfg.testing
    clip_length = cfg.get_path('dataset.testing.clip_length', 256)
    crop_size = cfg.get_path('dataset.testing.crop_size', 96)
    flags = factory.model_flags(cfg)
    if dtype is None:
        dtype = (jnp.float32
                 if cfg.get_path('model.compute_dtype') in ('float32',
                                                            'f32')
                 else jnp.bfloat16)
    model = factory.build_model(cfg, frame_num=clip_length, dtype=dtype)
    from opental_tpu.tools.test import load_variables
    shape = (1, clip_length, crop_size, crop_size, model.in_channels)
    variables = load_variables(model, te['checkpoint_path'], shape)
    score_func = 'dirichlet' if flags['use_edl'] else 'softmax'

    def forward(clips):
        out = model.apply(variables, clips)
        dec = decode_windows(out, clip_length, use_edl=flags['use_edl'],
                             os_head=flags['os_head'],
                             score_func=score_func,
                             evidence=flags['evidence'])
        return {'segments': dec.segments, 'scores': dec.scores,
                'uncertainty': dec.uncertainty,
                'actionness': dec.actionness}

    clip_shape = (window_batch, clip_length, crop_size, crop_size,
                  model.in_channels)
    if uint8_ingest:
        from opental_tpu.infer.pipeline import ingest_windows

        @jax.jit
        def serve_u8(clips_u8, frames_valid):
            return forward(ingest_windows(clips_u8, frames_valid))

        return serve_u8, (jax.ShapeDtypeStruct(clip_shape, jnp.uint8),
                          jax.ShapeDtypeStruct((window_batch,),
                                               jnp.int32))
    return jax.jit(forward), (jax.ShapeDtypeStruct(clip_shape,
                                                   jnp.float32),)


def export_model(cfg: Config, out_path: str, window_batch: int = 128,
                 platforms: Optional[Sequence[str]] = None,
                 uint8_ingest: bool = False) -> str:
    """Serialize the serving function to `out_path`. platforms defaults
    to the current backend; pass ('tpu',) or ('tpu', 'cpu') to fix the
    deployment targets regardless of the exporting host."""
    from jax import export as jexport

    from opental_tpu.ops.boundary_pool import force_xla_path
    serve, specs = build_inference_fn(cfg, window_batch,
                                      uint8_ingest=uint8_ingest)
    kw = {'platforms': list(platforms)} if platforms else {}
    multi = platforms and (len(platforms) > 1
                           or 'tpu' not in platforms)
    if multi:
        # the Pallas boundary-pool kernel only lowers for TPU; portable
        # artifacts trace the exact-parity XLA twin instead
        with force_xla_path():
            exp = jexport.export(serve, **kw)(*specs)
    else:
        exp = jexport.export(serve, **kw)(*specs)
    data = exp.serialize()
    with open(out_path, 'wb') as f:
        f.write(data)
    return out_path


def load_exported(path: str) -> Callable:
    """Deserialize a serving artifact; returns clips -> dict of arrays."""
    from jax import export as jexport
    with open(path, 'rb') as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument('config_file')
    p.add_argument('--out', default='model.jaxexp')
    p.add_argument('--checkpoint_path', default=None,
                   help='override testing.checkpoint_path')
    p.add_argument('--window_batch', type=int, default=128)
    p.add_argument('--platforms', default=None,
                   help='comma list, e.g. tpu,cpu (default: current '
                        'backend)')
    p.add_argument('--uint8', action='store_true',
                   help='serving signature (uint8 clips, int32 '
                        'frames-valid); normalize inside the artifact '
                        '(4x less transfer, packed-pipeline contract)')
    args = p.parse_args(argv)
    overrides = ({'testing.checkpoint_path': args.checkpoint_path}
                 if args.checkpoint_path else None)
    cfg = load_config(args.config_file, overrides=overrides)
    platforms = args.platforms.split(',') if args.platforms else None
    path = export_model(cfg, args.out, args.window_batch, platforms,
                        uint8_ingest=args.uint8)
    import os
    print(f'wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB, '
          f'W={args.window_batch}{", uint8" if args.uint8 else ""})')


if __name__ == '__main__':
    main()

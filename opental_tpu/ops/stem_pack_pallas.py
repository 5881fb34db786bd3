"""Pallas TPU kernel: fused space-to-depth + temporal-tap packing for
the I3D stem.

The stem (7x7x7 stride-2 conv on 3-channel video,
AFSD/common/i3d_backbone.py Unit3D(64, 7x7x7, stride 2)) is computed as
space-to-depth packing + a dense conv (models/layers.py
SpaceToDepthConv3d). This kernel emits the fully packed 96-channel
tensor

    z[b, u, p, q, at*24 + bt*12 + bi*6 + bj*3 + c]
        = xp[b, 2*(u + at) + bt, 2*p + bi, 2*q + bj, c]

in ONE pass over the padded input (XLA needs a chain of
reshape/transpose/concat ops that materializes the intermediate 24-
channel tensor plus a 4x temporal concat). The consumer is a single 2D
VALID conv with kernel (a_h, a_w, 96, F).

Grid: one step per (batch, output frame). The temporal windows overlap
(frames 2u..2u+7 for output u), which standard BlockSpecs cannot
express, so the input stays in ANY/HBM memory space and each step DMAs
its 8-frame window into VMEM scratch.

STATUS: correct in interpret mode (tests/test_stem_pack.py) but the
current Mosaic lowering REJECTS the in-kernel lane-splitting reshape
(Wp*c) -> (Wp/2, 2c) with "infer-vector-layout: unsupported shape cast",
so the model keeps the XLA path (SpaceToDepthConv3d: pack24 + conv3d —
90.6 ms at W=64, the fastest of 7 measured formulations; see CLAUDE.md
"stem formulations"). Kept as the candidate design if Mosaic gains
lane-split support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_hbm, out_ref, scratch, sem, *, a_t: int, c: int):
    b = pl.program_id(0)
    u = pl.program_id(1)
    frames = 2 * a_t  # temporal taps cover frames 2u .. 2u+2*a_t-1
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(2 * u, frames)], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]                       # (2*a_t, Hp, Wp*c)
    hp = x.shape[1]
    wc = x.shape[2]
    h2, w2 = hp // 2, wc // (2 * c)
    pieces = []
    for at in range(a_t):
        for bt in range(2):
            f = x[2 * at + bt]           # (Hp, Wp*c)
            fr = f.reshape(h2, 2, wc)
            for bi in range(2):
                r = fr[:, bi, :]         # (h2, Wp*c)
                pieces.append(r.reshape(h2, w2, 2 * c))
    out_ref[0, 0] = jnp.concatenate(pieces, axis=-1)


@functools.partial(jax.jit, static_argnames=('a_t', 'interpret'))
def stem_pack96(xp: Array, a_t: int = 4, interpret: bool = False) -> Array:
    """xp: (B, Tp, Hp, Wp, C) pre-padded video (Tp even, Hp/Wp even,
    Tp >= 2*(t_out-1) + 2*a_t). Returns z (B, t_out, Hp/2, Wp/2, 8*a_t*C)
    with t_out = Tp/2 - a_t + 1."""
    b, tp, hp, wp, c = xp.shape
    assert tp % 2 == 0 and hp % 2 == 0 and wp % 2 == 0
    t_out = tp // 2 - a_t + 1
    x2 = xp.reshape(b, tp, hp, wp * c)

    kern = functools.partial(_kernel, a_t=a_t, c=c)
    out = pl.pallas_call(
        kern,
        grid=(b, t_out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, hp // 2, wp // 2, 8 * a_t * c),
            lambda bi, ui: (bi, ui, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, t_out, hp // 2, wp // 2, 8 * a_t * c), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * a_t, hp, wp * c), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x2)
    return out


def stem_pack96_xla(xp: Array, a_t: int = 4) -> Array:
    """Pure-XLA reference for the same packing (used for testing and as
    the CPU fallback): staged space-to-depth + temporal concat."""
    b, tp, hp, wp, c = xp.shape
    y = xp.reshape(b, tp, hp, wp // 2, 2 * c)
    y = y.reshape(b, tp, hp // 2, 2, wp // 2, 2 * c
                  ).transpose(0, 1, 2, 4, 3, 5)
    y = y.reshape(b, tp, hp // 2, wp // 2, 4 * c)
    y = y.reshape(b, tp // 2, 2, hp // 2, wp // 2, 4 * c
                  ).transpose(0, 1, 3, 4, 2, 5)
    y = y.reshape(b, tp // 2, hp // 2, wp // 2, 8 * c)
    t_out = tp // 2 - a_t + 1
    return jnp.concatenate([y[:, at:at + t_out] for at in range(a_t)],
                           axis=-1)

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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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


# ---------------------------------------------------------------------------
# v2: Mosaic-compatible formulation (round-2 probe-driven redesign).
#
# v1 failed on the interleaved lane split (Wp*c) -> (Wp/2, 2c). v2 moves
# the W-deinterleave to ONE host-side XLA transpose that lays lanes out
# in (bj, c, q) CHUNKS; every in-kernel op is then from the
# probe-verified supported set (scripts/probe_mosaic_ops*.py): a
# lane-size-preserving sublane split, a middle-dim index, static lane
# slices at chunk offsets, and a LEADING-dim stack. Probe round 3:
# leading-dim assembly is the ONLY one that compiles at real shapes
# (stack-on-minor / batched-transpose / two-stage all crash Mosaic), and
# the consumer conv reads the resulting channel-leading layout at zero
# cost (NCHW conv == NHWC conv, 41.4 vs 41.3 ms measured).
#
# Channel order of the packed tensor is c' = (r, bi, bj, c) with
# r = 2*at + bt the relative frame; pack96_weights() maps the stored
# (7,7,7,C,F) stem kernel onto it, so the fused stem
#   host_prelayout -> pallas pack -> one 2D VALID conv (NCHW)
# is bit-identical math to the stride-2 conv3d
# (AFSD/common/i3d_backbone.py Unit3D(64, 7x7x7, stride 2)).
# ---------------------------------------------------------------------------


def host_prelayout(xp: Array) -> Array:
    """(B, Tp, Hp, Wp, C) -> (B, Tp, Hp8, 2*C*Wq) with lane order
    (bj, c, q): xw[..., (bj*C + c)*Wq + q] = xp[..., 2q+bj, c].

    Hp is zero-padded up to a multiple of 8: the kernel's per-step HBM
    DMA slices the H dim, and Mosaic requires sliced tiled dims aligned
    to the (8, 128) tile. The consumer drops the conv rows that touch
    the pad (stem_conv_v2)."""
    b, tp, hp, wp, c = xp.shape
    wq = wp // 2
    hp8 = hp + (-hp) % 8
    if hp8 != hp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, hp8 - hp), (0, 0), (0, 0)))
    xw = xp.reshape(b, tp, hp8, wq, 2, c).transpose(
        0, 1, 2, 4, 5, 3).reshape(b, tp, hp8, 2 * c * wq)
    lanes = 2 * c * wq
    lanes128 = lanes + (-lanes) % 128    # DMA slices need 128-aligned lanes
    if lanes128 != lanes:
        xw = jnp.pad(xw, ((0, 0), (0, 0), (0, 0), (0, lanes128 - lanes)))
    return xw


def _kernel_v2(x_hbm, out_ref, scratch, sem, *, a_t: int, c: int, wq: int,
               fp: int):
    b = pl.program_id(0)
    u = pl.program_id(1)
    frames = 2 * a_t + 2 * (fp - 1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(2 * fp * u, frames)], scratch, sem)
    dma.start()
    dma.wait()
    s = scratch[:]                        # (frames, Hp8, lanes128)
    hp, lanes = s.shape[1], s.shape[2]
    halves = []                           # per frame r, per bi: (hp/2, L)
    for r in range(frames):
        f = s[r].reshape(hp // 2, 2, lanes)
        halves.append((f[:, 0, :], f[:, 1, :]))
    pieces = []
    for r in range(2 * a_t):
        for bi in range(2):
            for bj in range(2):
                for cc in range(c):
                    lo = (bj * c + cc) * wq
                    # fp sub-frames side by side WITHOUT separators: the
                    # consumer discards conv outputs whose windows
                    # straddle sub-frame boundaries, so no zero gap is
                    # needed (and the same-(bi,lo) operands share Mosaic
                    # layout offsets, which a zeros-const concat breaks)
                    subs = [halves[2 * sub + r][bi][:, lo:lo + wq]
                            for sub in range(fp)]
                    pieces.append(subs[0] if fp == 1
                                  else jnp.concatenate(subs, axis=-1))
    out_ref[0, 0] = jnp.stack(pieces, axis=0)   # channel-leading


@functools.partial(jax.jit,
                   static_argnames=('a_t', 'c', 'wq', 'fp', 'interpret'))
def stem_pack96_v2(xw: Array, a_t: int = 4, c: int = 3,
                   wq: int | None = None, fp: int = 1,
                   interpret: bool = False) -> Array:
    """xw: (B, Tp, Hp8, lanes128) host-prelayouted video (see
    host_prelayout; lane content is (bj, c, q) chunks of width wq plus
    alignment zeros). Returns z (B, t_out/fp, 8*a_t*C, Hp8/2, fp*wq) —
    CHANNEL-LEADING, channel order (r, bi, bj, c).

    fp > 1 packs fp consecutive output frames side-by-side in lanes with
    no separator; conv windows that straddle a sub-frame boundary
    produce garbage columns the consumer discards. This cuts the
    128-lane padding tax (51 lanes pad 2.51x; 8*51=408 pad 1.25x) and
    the temporal DMA overlap (8 -> 2.75 frames/output at fp=8)."""
    b, tp, hp, lanes = xw.shape
    assert tp % 2 == 0 and hp % 2 == 0
    if wq is None:
        assert lanes % (2 * c) == 0
        wq = lanes // (2 * c)
    t_out = tp // 2 - a_t + 1
    assert t_out % fp == 0, (t_out, fp)
    ch = 8 * a_t * c
    wlane = fp * wq

    kern = functools.partial(_kernel_v2, a_t=a_t, c=c, wq=wq, fp=fp)
    return pl.pallas_call(
        kern,
        grid=(b, t_out // fp),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, ch, hp // 2, wlane),
            lambda bi, ui: (bi, ui, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, t_out // fp, ch, hp // 2, wlane), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * a_t + 2 * (fp - 1), hp, lanes), xw.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xw)


def pack96_weights(kernel: Array, a_t: int = 4) -> Array:
    """Map the stored stem kernel (kt,kh,kw,C,F) onto the v2 packed
    channel order: w2d[dh, dw, (r,bi,bj,c), f] = kpad[r, 2dh+bi,
    2dw+bj, c, f] (zero taps beyond kt/kh/kw)."""
    kt, kh, kw, c, f = kernel.shape
    kp = jnp.zeros((2 * a_t, kh + (-kh) % 2, kw + (-kw) % 2, c, f),
                   kernel.dtype)
    kp = kp.at[:kt, :kh, :kw].set(kernel)
    a_h, a_w = kp.shape[1] // 2, kp.shape[2] // 2
    w = kp.reshape(2 * a_t, a_h, 2, a_w, 2, c, f)
    w = w.transpose(1, 3, 0, 2, 4, 5, 6)     # (dh, dw, r, bi, bj, c, f)
    return w.reshape(a_h, a_w, 8 * a_t * c, f)


def stem_conv_v2(xp: Array, kernel: Array, a_t: int = 4, fp: int = 1,
                 chunk: int = 0, interpret: bool = False) -> Array:
    """Full fused stem: host prelayout -> pallas pack (channel-leading,
    fp output frames per grid step) -> one 2D VALID conv consuming NCHW
    directly (measured: NCHW conv == NHWC conv on TPU). Exact same math
    as the stride-2 SAME conv3d on xp (pre-padded as in models/layers.py
    SpaceToDepthConv3d).

    chunk > 0 processes the batch in chunks of that size under lax.map
    so the packed tensor never materializes whole (it is ~2.8x the input
    even at fp=2 because of lane-tile padding)."""
    if chunk and xp.shape[0] > chunk and xp.shape[0] % chunk == 0:
        xs = xp.reshape((xp.shape[0] // chunk, chunk) + xp.shape[1:])
        ys = jax.lax.map(
            lambda xb: stem_conv_v2(xb, kernel, a_t=a_t, fp=fp,
                                    interpret=interpret), xs)
        return ys.reshape((xp.shape[0],) + ys.shape[2:])

    b = xp.shape[0]
    c = xp.shape[-1]
    a_h = (kernel.shape[1] + 1) // 2
    a_w = (kernel.shape[2] + 1) // 2
    h_out = xp.shape[2] // 2 - a_h + 1   # true rows, pre H8-pad
    wq = xp.shape[3] // 2
    w_out = wq - a_w + 1
    t_full = xp.shape[1] // 2 - a_t + 1
    if t_full % fp:
        fp = 1
    xw = host_prelayout(xp)
    z = stem_pack96_v2(xw, a_t=a_t, c=c, wq=wq, fp=fp,
                       interpret=interpret)
    w2 = pack96_weights(kernel, a_t=a_t).astype(z.dtype)
    t2, ch, h2, wlane = z.shape[1], z.shape[2], z.shape[3], z.shape[4]
    y = jax.lax.conv_general_dilated(
        z.reshape(b * t2, ch, h2, wlane), w2, (1, 1), 'VALID',
        dimension_numbers=('NCHW', 'HWIO', 'NHWC'))
    y = y[:, :h_out]                      # drop rows touching the H8 pad
    if fp == 1:
        return y.reshape((b, t2) + y.shape[1:])
    # split the fp sub-frames back out of the lane axis, dropping the
    # output columns whose windows straddle sub-frame boundaries
    subs = [y[:, :, s * wq:s * wq + w_out] for s in range(fp)]
    y = jnp.stack(subs, axis=1)           # (b*t2, fp, h_out, w_out, F)
    return y.reshape((b, t2 * fp) + y.shape[2:])


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

"""Neural net building blocks (flax linen, channels-last, TPU-friendly).

Functional re-design of the reference layer library
(AFSD/common/layers.py, AFSD/common/i3d_backbone.py:7-87). Key differences
from the torch reference:

* channels-last layouts — (B, T, H, W, C) for video, (B, T, C) for temporal
  features — so XLA tiles convs straight onto the MXU;
* TF-style 'same' padding comes from XLA's native SAME semantics instead of
  dynamic F.pad (the reference's compute_pad, layers.py:137-158, reproduces
  exactly TF SAME, which is what lax SAME computes);
* BatchNorm is a frozen affine-with-running-stats op: every shipped config
  freezes the I3D BN (thumos14/BDNet.py:39-49), so stats/affine live in a
  non-trainable 'constants' collection.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Matches torch GroupNorm defaults (the reference wraps every pyramid conv in
# nn.GroupNorm(32, C), e.g. thumos14/BDNet.py:139).
GN_EPS = 1e-5
# Matches torch BatchNorm3d(eps=0.001) in the I3D backbone
# (i3d_backbone.py:43).
BN_EPS = 1e-3

glorot_uniform = nn.initializers.xavier_uniform()


def _to_tuple(x, n: int) -> Tuple[int, ...]:
    if isinstance(x, (tuple, list)):
        assert len(x) == n
        return tuple(x)
    return (x,) * n


class FrozenBatchNorm(nn.Module):
    """BatchNorm covering every reference freeze mode
    (thumos14/BDNet.py:39-49, nn.BatchNorm3d(eps=1e-3, momentum=0.01)
    i3d_backbone.py:43).

    Default (freeze_stats + freeze_affine, the shipped-config mode): all
    four tensors live in the non-trainable 'constants' collection and
    y = (x - mean) / sqrt(var + eps) * gamma + beta with running stats —
    identical trees/semantics to the original frozen-only module.

    freeze_affine=False moves gamma/beta into 'params' (trainable, the
    reference's freeze_bn_affine: false). freeze_stats=False with
    train_mode=True normalizes by biased batch statistics and EMA-updates
    the running stats with the unbiased batch variance (torch train-mode
    BN; update momentum 0.01) — apply with mutable=['constants'].
    """

    features: int
    eps: float = BN_EPS
    momentum: float = 0.01
    freeze_stats: bool = True
    freeze_affine: bool = True
    train_mode: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = (self.features,)
        if self.freeze_affine:
            gamma = self.variable('constants', 'scale',
                                  nn.initializers.ones, None, shape).value
            beta = self.variable('constants', 'bias',
                                 nn.initializers.zeros, None, shape).value
        else:
            gamma = self.param('scale', nn.initializers.ones, shape)
            beta = self.param('bias', nn.initializers.zeros, shape)
        mean_v = self.variable('constants', 'mean', nn.initializers.zeros,
                               None, shape)
        var_v = self.variable('constants', 'var', nn.initializers.ones,
                              None, shape)
        if (not self.freeze_stats) and self.train_mode:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # centered two-pass form: E[x^2]-E[x]^2 cancels
            # catastrophically for large-mean activations and can go
            # slightly negative; this cannot
            var = jnp.maximum(jnp.mean(jnp.square(xf - mean), axes), 0.0)
            n = x.size // self.features
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                mean_v.value = (1 - m) * mean_v.value + m * mean
                var_v.value = (1 - m) * var_v.value + m * unbiased
        else:
            mean = mean_v.value.astype(jnp.float32)
            var = var_v.value.astype(jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps)
        scale = (gamma * inv).astype(x.dtype)
        bias = (beta - mean * gamma * inv).astype(x.dtype)
        return x * scale + bias


def conv3d_temporal_decomp(x: Array, kernel: Array,
                           stride: Tuple[int, int, int],
                           pads: Sequence[Tuple[int, int]],
                           dtype: Any = None) -> Array:
    """3D conv as a sum of per-temporal-tap 2D convs.

    XLA's TPU conv3d lowering is pathologically slow for this model's
    shapes (measured 30x+ vs the identical sum-of-conv2d). Temporal taps
    become kt strided slices, each run through a 2D conv over the folded
    (B*T_out) batch. Exact same math.

    x: (B, T, H, W, C); kernel: (kt, kh, kw, C, O); pads: per-(T,H,W)
    explicit (lo, hi) pads (spatial pads are applied here, convs run
    VALID).
    """
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    kt = kernel.shape[0]
    st, sh, sw = stride
    xp = jnp.pad(x, [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)])
    b, tp, hp, wp, c = xp.shape
    out_t = (tp - kt) // st + 1
    acc = None
    for dt in range(kt):
        xs = jax.lax.slice_in_dim(xp, dt, dt + st * (out_t - 1) + 1,
                                  stride=st, axis=1)
        xs = xs.reshape((b * out_t, hp, wp, c))
        o = jax.lax.conv_general_dilated(
            xs, kernel[dt], (sh, sw), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        acc = o if acc is None else acc + o
    return acc.reshape((b, out_t) + acc.shape[1:])


class Conv3dDecomposed(nn.Module):
    """Parameter holder for the decomposed conv; param paths match
    nn.Conv ('kernel'/'bias')."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, pads: Sequence[Tuple[int, int]]) -> Array:
        kernel = self.param('kernel', glorot_uniform,
                            tuple(self.kernel_size)
                            + (x.shape[-1], self.features))
        out = conv3d_temporal_decomp(x, kernel, tuple(self.stride), pads,
                                     dtype=self.dtype)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            out = out + bias.astype(out.dtype)
        return out


def conv3d_temporal_fold(x: Array, kernel: Array,
                         dtype: Any = None) -> Array:
    """Stride-1 SAME 3D conv as ONE 2D conv on temporally-shifted copies
    concatenated into channels (kt*C input channels).

    Unlike conv3d_temporal_decomp (kt separate conv2d calls + sum), this
    keeps the MXU contraction wide (K = kh*kw*kt*C) at the cost of
    materializing the kt-fold concat — the winning trade for the
    channel-rich inception trunk (see BASELINE.md round-2 trunk A/B).
    Exact same math as lax conv3d.

    x: (B, T, H, W, C); kernel: (kt, kh, kw, C, O), kt odd, stride 1.
    """
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    kt, kh, kw, c, f = kernel.shape
    b, t, h, w, _ = x.shape
    lo = (kt - 1) // 2
    xp = jnp.pad(x, ((0, 0), (lo, kt - 1 - lo), (0, 0), (0, 0), (0, 0)))
    z = jnp.concatenate([xp[:, dt:dt + t] for dt in range(kt)], axis=-1)
    w2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(kh, kw, kt * c, f)
    y = jax.lax.conv_general_dilated(
        z.reshape(b * t, h, w, kt * c), w2, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y.reshape(b, t, h, w, f)


class Conv3dTFold(nn.Module):
    """Parameter holder for the temporal-fold conv; param path matches
    nn.Conv ('kernel'). Stride-1 SAME only."""

    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param('kernel', glorot_uniform,
                            tuple(self.kernel_size)
                            + (x.shape[-1], self.features))
        return conv3d_temporal_fold(x, kernel, dtype=self.dtype)


class Unit3D(nn.Module):
    """Conv3D + optional frozen BN + optional activation, TF-SAME padded.

    Covers both reference Unit3D variants: the I3D one
    (i3d_backbone.py:7-87; always same-padded, BN on) and the pyramid one
    (layers.py:106-175; 'spatial_valid' pads time only, GroupNorm used
    outside, bias on). The conv runs via the temporal-tap decomposition
    (see conv3d_temporal_decomp).
    """

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    padding: str = 'same'            # 'same' | 'spatial_valid' | 'valid'
    use_bias: bool = False
    use_batch_norm: bool = True
    activation: Optional[Callable[[Array], Array]] = nn.relu
    fold_temporal: bool = False      # kt>1 stride-1 SAME convs via t-fold
    bn_freeze_stats: bool = True
    bn_freeze_affine: bool = True
    bn_train: bool = False
    dtype: Any = None

    def _bn(self, x: Array) -> Array:
        return FrozenBatchNorm(self.features,
                               freeze_stats=self.bn_freeze_stats,
                               freeze_affine=self.bn_freeze_affine,
                               train_mode=self.bn_train, name='bn')(x)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = _to_tuple(self.kernel, 3)
        stride = _to_tuple(self.stride, 3)
        if (self.fold_temporal and kernel[0] > 1
                and stride == (1, 1, 1) and self.padding == 'same'
                and not self.use_bias):
            x = Conv3dTFold(self.features, kernel, dtype=self.dtype,
                            name='conv')(x)
            if self.use_batch_norm:
                x = self._bn(x)
            if self.activation is not None:
                x = self.activation(x)
            return x
        if self.padding == 'same':
            pad = 'SAME'
        elif self.padding == 'spatial_valid':
            # temporal SAME, spatial VALID (layers.py:161-168)
            t = x.shape[1]
            tp = _same_pad_amount(t, kernel[0], stride[0])
            pad = [tp, (0, 0), (0, 0)]
        elif self.padding == 'valid':
            pad = 'VALID'
        else:
            raise ValueError(self.padding)
        x = nn.Conv(self.features, kernel_size=kernel, strides=stride,
                    padding=pad, use_bias=self.use_bias,
                    kernel_init=glorot_uniform, dtype=self.dtype,
                    name='conv')(x)
        if self.use_batch_norm:
            x = self._bn(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class SpaceToDepthConv3d(nn.Module):
    """Stride-2 Conv3D computed via 2x2x2 space-to-depth — exact math.

    The I3D stem (7x7x7 stride-2 conv over 3 RGB channels) runs at ~2%
    MXU utilization because XLA pads the 3 input channels to the 128-lane
    reduction dim; it alone costs ~90% of the backbone. Packing 2x2x2
    input blocks into 24 channels and scattering the kernel into an
    equivalent stride-1 4x4x4 conv is bit-for-bit the same convolution
    (zero taps fill the scatter) at ~8x the lane utilization.

    Parameter shape/name matches nn.Conv ('conv/kernel'), so checkpoints
    and the torch converter are unaffected.
    """

    features: int
    kernel: Tuple[int, int, int] = (7, 7, 7)
    in_channels: int = 3
    # pack via the Pallas channel-leading kernel + NCHW conv
    # (ops/stem_pack_pallas.stem_conv_v2) instead of the XLA
    # pack24+conv3d path; TPU only (interpret mode is too slow on CPU)
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel
        kernel = self.param(
            'kernel', glorot_uniform,
            k + (self.in_channels, self.features))

        b, t, h, w, c = x.shape
        assert c == self.in_channels
        if self.dtype is not None:
            # cast before the space-to-depth shuffle: halves the data
            # movement; numerics unchanged (the conv casts anyway)
            x = x.astype(self.dtype)
        # TF-SAME pads for stride 2 (all dims even => total = k - 2)
        pads = []
        for size, kk in zip((t, h, w), k):
            total = max(kk - 2, 0) if size % 2 == 0 \
                else max(kk - 1, 0)
            lo = total // 2
            # one extra trailing zero when the padded extent is odd; it
            # only ever meets the zero taps added below
            hi = total - lo + ((size + total) % 2)
            pads.append((lo, hi))
        xp = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        if self.use_pallas:
            from opental_tpu.ops.stem_pack_pallas import stem_conv_v2
            return stem_conv_v2(xp, kernel.astype(xp.dtype))
        tp, hp, wp = xp.shape[1:4]
        # pack (2,2,2) blocks: y[.., u, p, q, (bt, bi, bj, c)], staged
        # one axis at a time (measured 30% faster than the 8-D transpose)
        y = xp.reshape(b, tp, hp, wp // 2, 2 * c)      # fold W: (bj, c)
        y = y.reshape(b, tp, hp // 2, 2, wp // 2, 2 * c
                      ).transpose(0, 1, 2, 4, 3, 5)
        y = y.reshape(b, tp, hp // 2, wp // 2, 4 * c)  # (bi, bj, c)
        y = y.reshape(b, tp // 2, 2, hp // 2, wp // 2, 4 * c
                      ).transpose(0, 1, 3, 4, 2, 5)
        y = y.reshape(b, tp // 2, hp // 2, wp // 2, 8 * c)

        # scatter the kernel: w'[a, (b_, c)] = w[2a + b_, c], zero at 2a+b_>=k
        kt, kh, kw = k
        kp = jnp.zeros((kt + (-kt) % 2, kh + (-kh) % 2, kw + (-kw) % 2,
                        c, self.features), kernel.dtype)
        kp = kp.at[:kt, :kh, :kw].set(kernel)
        a_t, a_h, a_w = kp.shape[0] // 2, kp.shape[1] // 2, kp.shape[2] // 2
        kprime = kp.reshape(a_t, 2, a_h, 2, a_w, 2, c, self.features)
        kprime = kprime.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(
            a_t, a_h, a_w, 8 * c, self.features)

        # one stride-1 VALID conv3d on the packed 24-channel tensor. At
        # 24 input channels XLA's conv3d lowering is efficient (the
        # round-1 30x pathology was the 3-channel raw stem); measured
        # 3.2x faster than materializing the 4 temporal taps into a
        # 96-channel concat + 2D conv (scripts/bench_stem.py: 16.8ms vs
        # 53.7ms at W=32 bf16 — the concat wrote 4x the packed tensor).
        return jax.lax.conv_general_dilated(
            y, kprime.astype(y.dtype), (1, 1, 1), 'VALID',
            dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))


class Unit1D(nn.Module):
    """Conv1D over (B, T, C) + optional activation (layers.py:178-214)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: str = 'same'
    use_bias: bool = True
    activation: Optional[Callable[[Array], Array]] = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = 'SAME' if self.padding == 'same' else 'VALID'
        x = nn.Conv(self.features, kernel_size=(self.kernel,),
                    strides=(self.stride,), padding=pad,
                    use_bias=self.use_bias, kernel_init=glorot_uniform,
                    dtype=self.dtype, name='conv')(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def _same_pad_amount(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF-SAME pad split (front = total // 2), as in layers.py:137-158."""
    if size % stride == 0:
        total = max(kernel - stride, 0)
    else:
        total = max(kernel - (size % stride), 0)
    return total // 2, total - total // 2


def max_pool_3d_same(x: Array, kernel: Sequence[int],
                     stride: Sequence[int]) -> Array:
    """Max-pool over (B, T, H, W, C) with the reference's zero-pad SAME
    (layers.py:9-35).

    The reference zero-pads then max-pools (layers.py:9-35). All of the
    I3D pool inputs are post-ReLU (>= 0), so zero padding equals -inf
    padding — we keep the exact zero-pad semantics regardless.

    Perf note: a separable per-axis formulation (three 1-D
    reduce_windows) was measured 18ms SLOWER for the full backbone at
    W=64 (222 vs 204 ms, scripts/bench_pool_ab.py) — XLA's fused 3-D
    reduce-window wins; don't "optimize" this again.
    """
    kernel = _to_tuple(kernel, 3)
    stride = _to_tuple(stride, 3)
    pads = [(0, 0)] + [
        _same_pad_amount(x.shape[1 + i], kernel[i], stride[i])
        for i in range(3)
    ] + [(0, 0)]
    x = jnp.pad(x, pads, mode='constant', constant_values=0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) + kernel + (1,),
        window_strides=(1,) + stride + (1,),
        padding='VALID')


class GroupNorm(nn.Module):
    """GroupNorm with torch-parity epsilon (flax default is 1e-6)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=GN_EPS)(x)


class ConvGNReLU1D(nn.Module):
    """Unit1D(activation=None) -> GroupNorm(32) -> ReLU.

    The standard block of the pyramid (thumos14/BDNet.py:156-203).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Unit1D(self.features, kernel=self.kernel, stride=self.stride,
                   activation=None, dtype=self.dtype, name='conv')(x)
        x = nn.GroupNorm(num_groups=32, epsilon=GN_EPS, name='gn')(x)
        return nn.relu(x)


class ScaleExp(nn.Module):
    """exp(x * learnable_scale) (thumos14/BDNet.py:55-61)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            'scale', lambda key: jnp.array([self.init_value], jnp.float32))
        return jnp.exp(x * scale.astype(x.dtype))


class RPLHead(nn.Module):
    """Reciprocal-point distance head (layers.py:314-351).

    Input (B, T, C) -> scaled squared-l2 distance to learned class centers,
    output (B, T, num_classes).
    """

    num_classes: int
    num_centers: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        feat_dim = x.shape[-1]
        centers = self.param(
            'centers',
            lambda key: 0.1 * jax.random.normal(
                key, (self.num_classes * self.num_centers, feat_dim)))
        f2 = jnp.sum(x * x, axis=-1, keepdims=True)              # (B,T,1)
        c2 = jnp.sum(centers * centers, axis=-1)                  # (KC,)
        cross = jnp.einsum('btd,kd->btk', x, centers,
                           preferred_element_type=jnp.float32)
        dist = (f2 - 2.0 * cross + c2) / float(feat_dim)          # (B,T,KC)
        dist = dist.reshape(x.shape[0], x.shape[1],
                            self.num_classes, self.num_centers)
        return jnp.mean(dist, axis=-1)

    @staticmethod
    def get_centers(params) -> Array:
        return params['centers']


def positional_encoding(length: int, d_model: int) -> Array:
    """Sinusoidal table (layers.py:217-241), shape (length, d_model)."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch-style, ReLU FFN)."""

    d_model: int
    nheads: int = 8
    d_ff: int = 256
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads, dropout_rate=self.dropout,
            deterministic=self.deterministic)(x, x)
        x = nn.LayerNorm()(x + attn)
        h = nn.Dense(self.d_ff)(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model)(h)
        return nn.LayerNorm()(x + h)


class TransformerHead(nn.Module):
    """Optional transformer conf head (layers.py:244-311; off in all
    shipped configs). Input (B, T, C) -> (B, T, num_classes)."""

    num_classes: int
    nheads: int = 8
    nlayers: int = 2
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d_model = x.shape[-1]
        for _ in range(self.nlayers):
            x = TransformerEncoderLayer(
                d_model=d_model, nheads=self.nheads,
                d_ff=d_model // 2, dropout=self.dropout,
                deterministic=self.deterministic)(x)
        return nn.Dense(self.num_classes)(x)


def interpolate_nearest_1d(x: Array, out_len: int) -> Array:
    """Nearest-neighbor resize along axis 1 of (B, T, C).

    Matches F.interpolate(mode='nearest') index rule
    (idx = floor(i * in/out)), used to merge pyramid levels and build the
    frame-level feature (thumos14/BDNet.py:318,325).
    """
    t = x.shape[1]
    if out_len == t:
        return x
    if out_len % t == 0:
        return jnp.repeat(x, out_len // t, axis=1)
    idx = (jnp.arange(out_len) * t) // out_len
    return jnp.take(x, idx, axis=1)

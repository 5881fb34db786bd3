"""Probe: does XLA-on-TPU lower int8 conv3d to the MXU int8 path, and
is it faster than bf16? v5e int8 peak is ~2x bf16, so a win here would
open a quantized-serving mode (documented deviation — int8 changes
numerics).

Shapes are the measured hot trunk convs at W=16 (scaled down from the
in-model W=64 stage costs in CLAUDE.md so each probe compile stays
small through the compile helper):
  - Conv3d_2c_3x3: (W, 64, 24, 24, 64) -> 192, kernel (3,3,3)
  - Mixed_4b b1b:  (W, 32, 12, 12, 96) -> 208, kernel (3,3,3)

Timing per CLAUDE.md: chain iterations through a data dependency,
full-sum witness, fetch one scalar at the end; subtract nothing (A/B
within one process only).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

W = int(sys.argv[sys.argv.index('--w') + 1]) if '--w' in sys.argv else 16


def time_fn(fn, *args, n=20, warm=3):
    carry = jnp.float32(0)
    for _ in range(warm):
        carry = fn(carry, *args)
    float(carry)
    carry = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = fn(carry, *args)
    float(carry)
    return (time.perf_counter() - t0) / n


def conv(x, k, dtype, pref):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1, 1), 'SAME',
        dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'),
        preferred_element_type=pref)


def probe(name, shape, cout, kernel):
    rng = np.random.RandomState(0)
    x_f = jnp.asarray(rng.randn(*shape), jnp.float32)
    k_f = jnp.asarray(
        rng.randn(*kernel, shape[-1], cout) * 0.1, jnp.float32)
    # int8 quantized twins (scale irrelevant to timing)
    x_i = jnp.asarray(
        np.clip(rng.randn(*shape) * 40, -127, 127).astype(np.int8))
    k_i = jnp.asarray(np.clip(
        rng.randn(*kernel, shape[-1], cout) * 40, -127, 127
    ).astype(np.int8))

    @jax.jit
    def step_bf16(c, x, k):
        y = conv(x + c.astype(jnp.bfloat16) * 0, k, jnp.bfloat16,
                 jnp.float32)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def step_int8(c, x, k):
        xx = x + (c.astype(jnp.int8) * 0)
        y = conv(xx, k, jnp.int8, jnp.int32)
        return jnp.sum(y.astype(jnp.float32))

    t_bf = time_fn(step_bf16, x_f.astype(jnp.bfloat16),
                   k_f.astype(jnp.bfloat16))
    print(f'{name} bf16: {t_bf*1000:8.2f} ms', flush=True)
    try:
        t_i8 = time_fn(step_int8, x_i, k_i)
        print(f'{name} int8: {t_i8*1000:8.2f} ms '
              f'({t_bf/t_i8:.2f}x vs bf16)', flush=True)
    except Exception as e:  # noqa: BLE001 — probe records any failure
        print(f'{name} int8: FAILED {type(e).__name__}: {e}', flush=True)


def main():
    print(f'devices: {jax.devices()}  W={W}', flush=True)
    probe('conv2c', (W, 64, 24, 24, 64), 192, (3, 3, 3))
    probe('m4b_b1b', (W, 32, 12, 12, 96), 208, (3, 3, 3))


if __name__ == '__main__':
    main()

"""A/B the backward of one trunk conv3d (perf exploration, round 3).

Round-3 breakdown (scripts/bench_bwd_breakdown.py): trunk stages'
backwards run at 3.2-3.7x their forwards (theoretical 2x) — ~36 ms/step
of headroom at bs=8. This isolates ONE representative conv (conv2c
3x3x3 64->192 at (8,128,24,24,64)) and times:
  fwd            : the conv itself
  grad_w (native): jax.grad wrt kernel
  grad_x (native): jax.grad wrt input
  grad_w (einsum): dW as 27 shifted einsums (explicit MXU matmuls)
  grad_x (fold)  : dX as conv with flipped kernel / IO-swapped dims

to find which half is slow and whether a reformulation beats XLA's
transposed-conv emission.
"""
import sys
import time

import jax
import jax.numpy as jnp

B, T, H, W, CIN, COUT = 8, 128, 24, 24, 64, 192
K = 3
DT = jnp.bfloat16


def chain(f, *args, iters=8, warm=1):
    carry = jnp.float32(0)
    for _ in range(warm):
        carry = f(*args, carry)
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(iters):
        carry = f(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters


def conv(x, w):
    # plain bf16 conv, matching nn.Conv(dtype=bf16) in the model
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), 'SAME',
        dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))


def main():
    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (B, T, H, W, CIN), DT)
    w = jax.random.normal(kx, (K, K, K, CIN, COUT), DT)
    dy = jax.random.normal(kx, (B, T, H, W, COUT), DT)

    @jax.jit
    def t_fwd(x, w, c):
        return jnp.sum(conv(x + c.astype(DT) * 0, w).astype(jnp.float32))

    @jax.jit
    def t_gw(x, w, dy, c):
        _, vjp = jax.vjp(lambda ww: conv(x + c.astype(DT) * 0, ww), w)
        return jnp.sum(vjp(dy)[0].astype(jnp.float32))

    @jax.jit
    def t_gx(x, w, dy, c):
        _, vjp = jax.vjp(lambda xx: conv(xx, w), x + c.astype(DT) * 0)
        return jnp.sum(vjp(dy)[0].astype(jnp.float32))

    @jax.jit
    def t_gw_einsum(x, w, dy, c):
        # dW[dt,dh,dw,i,o] = sum_bthw x[b,t+dt-1,...,i] dy[b,t,...,o]
        xx = jnp.pad(x + c.astype(DT) * 0,
                     ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        pieces = []
        for dt in range(K):
            for dh in range(K):
                for dw in range(K):
                    xs = jax.lax.dynamic_slice(
                        xx, (0, dt, dh, dw, 0), (B, T, H, W, CIN))
                    pieces.append(jnp.einsum(
                        'bthwi,bthwo->io', xs, dy,
                        preferred_element_type=jnp.float32))
        dwk = jnp.stack(pieces, 0).reshape(K, K, K, CIN, COUT)
        return jnp.sum(dwk)

    @jax.jit
    def t_gx_flip(x, w, dy, c):
        # dX = conv(dy, flip(W) with I/O swapped), SAME
        wf = jnp.flip(w, (0, 1, 2)).transpose(0, 1, 2, 4, 3)
        return jnp.sum(conv(dy + c.astype(DT) * 0, wf)
                       .astype(jnp.float32))

    flops_fwd = 2 * B * T * H * W * K * K * K * CIN * COUT
    for name, fn, args in (
            ('fwd          ', t_fwd, (x, w)),
            ('grad_w native', t_gw, (x, w, dy)),
            ('grad_x native', t_gx, (x, w, dy)),
            ('grad_w einsum', t_gw_einsum, (x, w, dy)),
            ('grad_x flip  ', t_gx_flip, (x, w, dy))):
        t = chain(fn, *args)
        print(f'{name}: {t*1000:7.2f} ms  '
              f'({flops_fwd/t/1e12:6.1f} TFLOP/s eff)', flush=True)


if __name__ == '__main__':
    main()

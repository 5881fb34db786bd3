"""Standalone TPU timing of I3D-stem packing variants (perf experiment).

Times the full SpaceToDepthConv3d stem and variants that avoid the
4-tap concat materialization. Chained-carry timing per CLAUDE.md.
"""
import time
import jax, jax.numpy as jnp, numpy as np

W, T, HW, C, F = 32, 256, 96, 3, 64
DT = jnp.bfloat16


def pads_for(shape_thw, k):
    pads = []
    for size, kk in zip(shape_thw, k):
        total = max(kk - 2, 0) if size % 2 == 0 else max(kk - 1, 0)
        lo = total // 2
        hi = total - lo + ((size + total) % 2)
        pads.append((lo, hi))
    return pads


def pack(xp):
    b, tp, hp, wp, c = xp.shape
    y = xp.reshape(b, tp, hp, wp // 2, 2 * c)
    y = y.reshape(b, tp, hp // 2, 2, wp // 2, 2 * c).transpose(0, 1, 2, 4, 3, 5)
    y = y.reshape(b, tp, hp // 2, wp // 2, 4 * c)
    y = y.reshape(b, tp // 2, 2, hp // 2, wp // 2, 4 * c).transpose(0, 1, 3, 4, 2, 5)
    return y.reshape(b, tp // 2, hp // 2, wp // 2, 8 * c)


def kscatter(kernel, k=(7, 7, 7)):
    kt, kh, kw = k
    c, f = kernel.shape[3], kernel.shape[4]
    kp = jnp.zeros((kt + (-kt) % 2, kh + (-kh) % 2, kw + (-kw) % 2, c, f), kernel.dtype)
    kp = kp.at[:kt, :kh, :kw].set(kernel)
    a = (kp.shape[0] // 2, kp.shape[1] // 2, kp.shape[2] // 2)
    kpr = kp.reshape(a[0], 2, a[1], 2, a[2], 2, c, f).transpose(0, 2, 4, 1, 3, 5, 6, 7)
    return kpr.reshape(a[0], a[1], a[2], 8 * c, f), a


def variant_A(x, kernel):
    """current: staged pack + 4-tap concat + one 2D conv"""
    xp = jnp.pad(x.astype(DT), [(0, 0)] + pads_for((T, HW, HW), (7, 7, 7)) + [(0, 0)])
    y = pack(xp)
    kprime, (a_t, a_h, a_w) = kscatter(kernel)
    t_out = y.shape[1] - a_t + 1
    z = jnp.concatenate([y[:, at:at + t_out] for at in range(a_t)], -1)
    z = z.reshape((z.shape[0] * t_out,) + z.shape[2:])
    kf = jnp.concatenate([kprime[at] for at in range(a_t)], axis=2).astype(DT)
    out = jax.lax.conv_general_dilated(z, kf, (1, 1), 'VALID',
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out.reshape((x.shape[0], t_out) + out.shape[1:])


def variant_B(x, kernel):
    """pack + 3D conv (no concat)"""
    xp = jnp.pad(x.astype(DT), [(0, 0)] + pads_for((T, HW, HW), (7, 7, 7)) + [(0, 0)])
    y = pack(xp)
    kprime, _ = kscatter(kernel)
    return jax.lax.conv_general_dilated(
        y, kprime.astype(DT), (1, 1, 1), 'VALID',
        dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))


def variant_C(x, kernel):
    """pack + per-tap 2D conv + shifted output sum"""
    xp = jnp.pad(x.astype(DT), [(0, 0)] + pads_for((T, HW, HW), (7, 7, 7)) + [(0, 0)])
    y = pack(xp)
    kprime, (a_t, a_h, a_w) = kscatter(kernel)
    b, tp2 = y.shape[0], y.shape[1]
    t_out = tp2 - a_t + 1
    yf = y.reshape((b * tp2,) + y.shape[2:])
    outs = []
    for at in range(a_t):
        o = jax.lax.conv_general_dilated(yf, kprime[at].astype(DT), (1, 1), 'VALID',
                                         dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        outs.append(o.reshape((b, tp2) + o.shape[1:])[:, at:at + t_out])
    return sum(outs)


def variant_G(x, kernel):
    """space-to-depth via one-hot conv (no host transposes) + concat + 2D conv"""
    xc = x.astype(DT)
    xp = jnp.pad(xc, [(0, 0)] + pads_for((T, HW, HW), (7, 7, 7)) + [(0, 0)])
    eye = jnp.zeros((2, 2, 2, C, 8 * C), DT)
    for bt in range(2):
        for bi in range(2):
            for bj in range(2):
                for cc in range(C):
                    eye = eye.at[bt, bi, bj, cc, ((bt * 2 + bi) * 2 + bj) * C + cc].set(1)
    y = jax.lax.conv_general_dilated(xp, eye, (2, 2, 2), 'VALID',
                                     dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))
    kprime, (a_t, a_h, a_w) = kscatter(kernel)
    t_out = y.shape[1] - a_t + 1
    z = jnp.concatenate([y[:, at:at + t_out] for at in range(a_t)], -1)
    z = z.reshape((z.shape[0] * t_out,) + z.shape[2:])
    kf = jnp.concatenate([kprime[at] for at in range(a_t)], axis=2).astype(DT)
    out = jax.lax.conv_general_dilated(z, kf, (1, 1), 'VALID',
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out.reshape((x.shape[0], t_out) + out.shape[1:])


def timeit(name, fn, x, kernel, iters=10):
    f = jax.jit(lambda xx: fn(xx, kernel)[0, 0, 0, 0, 0].astype(jnp.float32))
    carry = jnp.float32(0)
    carry = f(x + carry * 0); float(carry)  # compile+warm
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(iters):
        carry = f(x + carry * 0)
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name}: {dt*1000:.2f} ms')
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(W, T, HW, HW, C), jnp.float32)
    kernel = jnp.asarray(rng.randn(7, 7, 7, C, F).astype(np.float32) * 0.05)
    # correctness cross-check on small slice (f32 to be safe)
    a = jax.jit(lambda xx: variant_A(xx, kernel))(x[:2])
    for nm, fn in (('B', variant_B), ('C', variant_C), ('G', variant_G)):
        b = jax.jit(lambda xx, fn=fn: fn(xx, kernel))(x[:2])
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f'variant {nm} max|diff| vs A: {d:.5f}')
    for nm, fn in (('A current', variant_A), ('B conv3d', variant_B),
                   ('C per-tap sum', variant_C), ('G onehot-conv', variant_G)):
        timeit(nm, fn, x, kernel)


if __name__ == '__main__':
    main()

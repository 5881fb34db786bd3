"""In-process A/B: monolithic 3-D maxpool vs separable per-axis pools,
inside the full backbone (same witness, interleaved runs)."""
import time
import jax, jax.numpy as jnp, numpy as np
import opental_tpu.models.layers as L

W, CLIP, CROP = 64, 256, 96

def mono_pool(x, kernel, stride):
    kernel = L._to_tuple(kernel, 3); stride = L._to_tuple(stride, 3)
    pads = [(0, 0)] + [L._same_pad_amount(x.shape[1 + i], kernel[i], stride[i])
                       for i in range(3)] + [(0, 0)]
    x = jnp.pad(x, pads, mode='constant', constant_values=0)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1,) + kernel + (1,),
                                 (1,) + stride + (1,), padding='VALID')

sep_pool = L.max_pool_3d_same

def build(pool):
    L.max_pool_3d_same = pool
    import importlib
    import opental_tpu.models.i3d as i3d
    importlib.reload(i3d)
    m = i3d.InceptionI3d(dtype=jnp.bfloat16)
    return m

def witness(m, v):
    return jax.jit(lambda xx: sum(jnp.sum(o.astype(jnp.float32))
                                  for o in m.apply(v, xx).values()))

def chain(f, x, iters=8):
    carry = jnp.float32(0)
    for _ in range(2): carry = f(x + carry * 0)
    float(carry)
    t0 = time.perf_counter(); carry = jnp.float32(0)
    for _ in range(iters): carry = f(x + carry * 0)
    float(carry)
    return (time.perf_counter() - t0) / iters

def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(W, CLIP, CROP, CROP, 3), jnp.float32)
    ms, fs = {}, {}
    for name, pool in (('mono', mono_pool), ('sep', sep_pool)):
        m = build(pool)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x[:1])
        fs[name] = witness(m, v)
        fs[name](x)  # compile
    for rep in range(3):
        for name in ('mono', 'sep'):
            t = chain(fs[name], x)
            ms.setdefault(name, []).append(t * 1000)
            print(f'rep{rep} {name}: {t*1000:.1f} ms', flush=True)
    for name, ts in ms.items():
        print(f'{name}: min {min(ts):.1f} ms', flush=True)

if __name__ == '__main__':
    main()

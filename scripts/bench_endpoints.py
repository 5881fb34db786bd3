"""Per-endpoint cumulative TPU timing of the I3D backbone."""
import time
import jax, jax.numpy as jnp, numpy as np
from opental_tpu.models.i3d import InceptionI3d

W, CLIP, CROP = 64, 256, 96
CUTS = ['Conv3d_1a_7x7', 'MaxPool3d_2a_3x3', 'Conv3d_2c_3x3',
        'MaxPool3d_3a_3x3', 'Mixed_3c', 'MaxPool3d_4a_3x3', 'Mixed_4f',
        'Mixed_5c']

def chain(f, x, iters=8, warm=2):
    carry = jnp.float32(0)
    for _ in range(warm):
        carry = f(x + carry * 0)
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(iters):
        carry = f(x + carry * 0)
    float(carry)
    return (time.perf_counter() - t0) / iters

def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(W, CLIP, CROP, CROP, 3), jnp.float32)
    prev = 0.0
    for cut in CUTS:
        m = InceptionI3d(final_endpoint=cut, keep=(cut,),
                         dtype=jnp.bfloat16)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x[:1])
        f = jax.jit(lambda xx, m=m, v=v, cut=cut: jnp.sum(
            m.apply(v, xx)[cut].astype(jnp.float32)))
        t = chain(f, x)
        print(f'{cut:20s} cumulative {t*1000:7.1f} ms  (+{(t-prev)*1000:6.1f} ms)')
        prev = t

if __name__ == '__main__':
    main()

"""Per-stage TPU timing of the inference forward (perf exploration)."""
import time
import jax, jax.numpy as jnp, numpy as np
from opental_tpu.models.bdnet import BDNet
from opental_tpu.infer.decode import decode_windows

W, CLIP, CROP = 64, 256, 96

def chain(f, x, iters=10, warm=2):
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
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(W, CLIP, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    stem = jax.jit(lambda xx: model.apply(
        variables, xx,
        method=lambda m, a: m.backbone.stem_only(a)
        if hasattr(m.backbone, 'stem_only') else None))
    # full-sum witnesses: sliced witnesses let XLA narrow conv outputs
    backbone = jax.jit(lambda xx: sum(
        jnp.sum(v.astype(jnp.float32)) for v in model.apply(
            variables, xx, method=lambda m, a: m.backbone(a)).values()))
    full = jax.jit(lambda xx: sum(
        jnp.sum(v.astype(jnp.float32)) for k, v in
        model.apply(variables, xx).items() if v is not None))
    def _dec_sum(xx):
        d = decode_windows(model.apply(variables, xx), CLIP, use_edl=True,
                           os_head=True, score_func='dirichlet')
        return (jnp.sum(d.scores.astype(jnp.float32))
                + jnp.sum(d.segments.astype(jnp.float32))
                + jnp.sum(d.uncertainty.astype(jnp.float32))
                + jnp.sum(d.actionness.astype(jnp.float32)))
    full_dec = jax.jit(_dec_sum)

    t_bb = chain(backbone, x)
    print(f'backbone only: {t_bb*1000:.1f} ms ({W/t_bb:.0f} clips/s)')
    t_full = chain(full, x)
    print(f'full model:    {t_full*1000:.1f} ms ({W/t_full:.0f} clips/s)')
    t_dec = chain(full_dec, x)
    print(f'model+decode:  {t_dec*1000:.1f} ms ({W/t_dec:.0f} clips/s)')

if __name__ == '__main__':
    main()

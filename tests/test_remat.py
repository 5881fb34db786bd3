"""model.remat must be a pure memory/compute trade: identical params,
outputs, and gradients vs the non-remat model (backbone blocks are
rematerialized in the backward pass — beyond-reference TPU feature for
large-batch training; see BASELINE.md train scaling)."""

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.models.bdnet import BDNet

FRAME, CROP = 128, 32


def test_remat_matches_baseline():
    base = BDNet(num_classes=16, os_head=True, use_edl=True,
                 frame_num=FRAME)
    rmt = BDNet(num_classes=16, os_head=True, use_edl=True,
                frame_num=FRAME, remat=True)
    x = jnp.asarray(np.random.RandomState(0).randn(
        1, FRAME, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    # identical variable trees (lifted transforms keep module names)
    v2 = jax.eval_shape(lambda: rmt.init(jax.random.PRNGKey(0), x))
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(variables))

    def scalar(model):
        def f(params):
            out = model.apply(
                {'params': params, 'constants': variables['constants']},
                x)
            return (jnp.sum(out['conf']) + jnp.sum(out['loc'] * 1e-3)
                    + jnp.sum(out['prop_conf'])), out
        return jax.jit(jax.value_and_grad(f, has_aux=True))

    (loss_a, out_a), grads_a = scalar(base)(variables['params'])
    (loss_b, out_b), grads_b = scalar(rmt)(variables['params'])

    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b['conf']),
                               np.asarray(out_a['conf']),
                               rtol=1e-5, atol=1e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(grads_a)
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(grads_b)}
    for path, a in flat_a:
        b = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))

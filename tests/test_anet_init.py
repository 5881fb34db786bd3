"""ANet head re-init statistics (anet/BDNet.py:448-451): after
reinit_anet_heads, every Conv1d kernel in the nine tower/head module
groups is ~normal(0, 0.01) with zero bias; everything else keeps its
glorot init; and the transform is deterministic in the RNG key."""

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.models.anet_pyramid import (ANET_REINIT_MODULES,
                                             reinit_anet_heads)
from opental_tpu.models.bdnet import BDNet


def _flat(params):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_leaves_with_path(params)}


def test_anet_head_reinit_statistics():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=64, arch='anet')
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 32, 32, 3)))
    before = _flat(variables['params'])
    after_params = reinit_anet_heads(variables['params'],
                                     jax.random.PRNGKey(1))
    after = _flat(after_params)

    n_reinit = 0
    for key, b in after.items():
        a = before[key]
        in_group = any(f"['{m}']" in key for m in ANET_REINIT_MODULES)
        is_conv1d_kernel = key.endswith("['kernel']") and b.ndim == 3
        is_gn = "['gn']" in key
        if in_group and not is_gn and is_conv1d_kernel:
            n_reinit += 1
            assert abs(float(b.std()) - 0.01) < 0.004, (key, b.std())
            assert abs(float(b.mean())) < 0.005, key
            assert not np.allclose(a, b), key
        elif in_group and not is_gn and key.endswith("['bias']"):
            np.testing.assert_array_equal(b, 0.0, err_msg=key)
        else:
            np.testing.assert_array_equal(a, b, err_msg=key)
    # 2 towers x 2 convs + 4 branch convs x 2 + 5 heads = 17 kernels
    assert n_reinit == 17, n_reinit

    again = _flat(reinit_anet_heads(variables['params'],
                                    jax.random.PRNGKey(1)))
    for key in after:
        np.testing.assert_array_equal(after[key], again[key], err_msg=key)

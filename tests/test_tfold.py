"""trunk_tfold parity: the temporal-channel-fold formulation of the
trunk 3x3x3 convs (models/layers.py conv3d_temporal_fold) is exact math
— identical backbone outputs from identical params with the flag on/off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.models.i3d import InceptionI3d
from opental_tpu.models.layers import conv3d_temporal_fold


def test_conv3d_temporal_fold_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 5, 5, 7), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 7, 4), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), 'SAME',
        dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))
    got = conv3d_temporal_fold(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5)


def test_backbone_tfold_matches_conv3d():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 32, 32, 3), jnp.float32)
    base = InceptionI3d(final_endpoint='Mixed_3c', keep=('Mixed_3c',))
    variables = base.init(jax.random.PRNGKey(0), x)
    out_a = base.apply(variables, x)['Mixed_3c']
    folded = InceptionI3d(final_endpoint='Mixed_3c', keep=('Mixed_3c',),
                          trunk_tfold=True)
    out_b = folded.apply(variables, x)['Mixed_3c']
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=2e-4, rtol=2e-4)

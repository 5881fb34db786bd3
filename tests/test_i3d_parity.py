"""I3D backbone parity vs the reference torch implementation.

Builds the reference InceptionI3d (pure torch, imported from
/root/reference) with random weights + random BN running stats, converts
them with opental_tpu.utils.torch_convert, and checks Mixed_4f / Mixed_5c
activations agree. This validates conv/pool SAME-padding semantics, BN
freezing, and the weight layout transposes in one shot.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opental_tpu.models.i3d import InceptionI3d  # noqa: E402
from opental_tpu.utils import torch_convert as tc  # noqa: E402


@pytest.fixture(scope='module')
def ref_model():
    from AFSD.common.i3d_backbone import InceptionI3d as TorchI3d
    torch.manual_seed(0)
    m = TorchI3d(final_endpoint='Mixed_5c', in_channels=3)
    m.build()
    # randomize BN running stats so frozen-BN math is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    m.eval()
    return m


def test_i3d_endpoint_parity(ref_model):
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 16, 32, 32).astype(np.float32)  # torch layout

    with torch.no_grad():
        ref_out = ref_model.extract_features(torch.from_numpy(x))

    variables = tc.convert_state_dict(ref_model.state_dict(), tc.map_i3d_key)
    model = InceptionI3d()
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # channels-last
    tmpl = model.init(jax.random.PRNGKey(0), x_jax)
    merged = {
        'params': tc.merge_variables(tmpl['params'], variables['params'],
                                     strict=True),
        'constants': tc.merge_variables(tmpl['constants'],
                                        variables['constants'], strict=True),
    }
    out = model.apply(merged, x_jax)

    for ep in ('Mixed_4f', 'Mixed_5c'):
        want = ref_out[ep].numpy()                       # (B, C, T, H, W)
        got = np.transpose(np.asarray(out[ep]), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

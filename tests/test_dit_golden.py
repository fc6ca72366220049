"""Golden parity: our WanDiT vs. the reference WanTransformer4DModel.

Random-weight reference model -> converter -> compare full forward outputs.
Covers patchify, 3-axis RoPE, qk-norm attention, adaLN blocks, t2v/i2v cross
attention, head, unpatchify, and the FiLM SpatialGuidanceModule (tested in
isolation since the reference only feeds it from its embedded extractors).

The reference falls back to torch SDPA on CPU which ignores k_lens, so all
comparisons run with seq_len == true token count (no padding).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from more4d_tpu.config import DiTConfig  # noqa: E402
from more4d_tpu.convert.dit_torch import convert_dit_state_dict  # noqa: E402
from more4d_tpu.models import WanDiT  # noqa: E402

from _ref_loader import load_reference_dit  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_dit("wan_transformer4d")


def _make_pair(ref_mod, model_type, seed=0, num_layers=2, ref_conv=False):
    torch.manual_seed(seed)
    dim, ffn, heads, text_dim, clip_dim = 48, 96, 2, 24, 36
    ref = ref_mod.WanTransformer4DModel(
        model_type=model_type, patch_size=(1, 2, 2), text_len=20,
        in_dim=20, dim=dim, ffn_dim=ffn, freq_dim=32, text_dim=text_dim,
        out_dim=16, num_heads=heads, num_layers=num_layers,
        qk_norm=True, cross_attn_norm=True, use_dino_guidance=False,
        use_omnimae_guidance=False, add_ref_conv=ref_conv,
        in_dim_ref_conv=16)
    # reference hard-codes img_emb input width 1280 (MLPProj(1280, dim))
    ref.eval()
    # randomise the zero-init head so outputs are non-trivial
    with torch.no_grad():
        ref.head.head.weight.add_(torch.randn_like(ref.head.head.weight)
                                  * 0.05)

    cfg = DiTConfig(model_type=model_type, patch_size=(1, 2, 2), text_len=20,
                    in_dim=20, dim=dim, ffn_dim=ffn, freq_dim=32,
                    text_dim=text_dim, out_dim=16, num_heads=heads,
                    num_layers=num_layers, clip_dim=1280,
                    motion_guidance=False, ref_conv=ref_conv,
                    dtype=jnp.float32, attention_backend="xla")
    params = convert_dit_state_dict(
        {k: v for k, v in ref.state_dict().items()}, cfg)
    return ref, WanDiT(cfg), params, cfg


def _np_t(x):
    return torch.from_numpy(x)


@pytest.mark.parametrize("model_type", ["t2v", "i2v"])
def test_forward_matches_reference(ref_mod, model_type):
    ref, model, params, cfg = _make_pair(ref_mod, model_type)
    rng = np.random.RandomState(0)
    b, tt, hh, ww = 2, 3, 8, 8
    x = rng.randn(b, 16, tt, hh, ww).astype(np.float32)
    y = rng.randn(b, 4, tt, hh, ww).astype(np.float32)
    t = np.array([300.0, 77.0], np.float32)
    ctx = rng.randn(b, 20, cfg.text_dim).astype(np.float32)
    clip = rng.randn(b, 257, 1280).astype(np.float32) if model_type == "i2v" \
        else None

    seq_len = tt * (hh // 2) * (ww // 2)
    with torch.no_grad():
        out_ref = ref(
            _np_t(x), _np_t(t), context=list(_np_t(ctx)), seq_len=seq_len,
            y=_np_t(y),
            clip_fea=_np_t(clip) if clip is not None else None).numpy()

    out = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
        jnp.asarray(t), jnp.asarray(ctx),
        y=jnp.asarray(np.transpose(y, (0, 2, 3, 4, 1))),
        clip_fea=jnp.asarray(clip) if clip is not None else None)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, rtol=5e-4, atol=5e-4)


def test_ref_conv_matches_reference(ref_mod):
    ref, model, params, cfg = _make_pair(ref_mod, "t2v", seed=1,
                                         ref_conv=True)
    rng = np.random.RandomState(1)
    b, tt, hh, ww = 1, 3, 8, 8
    x = rng.randn(b, 16, tt, hh, ww).astype(np.float32)
    y = rng.randn(b, 4, tt, hh, ww).astype(np.float32)
    full_ref = rng.randn(b, 16, hh, ww).astype(np.float32)
    t = np.array([512.0], np.float32)
    ctx = rng.randn(b, 20, cfg.text_dim).astype(np.float32)

    seq_len = tt * (hh // 2) * (ww // 2)
    with torch.no_grad():
        out_ref = ref(_np_t(x), _np_t(t), context=list(_np_t(ctx)),
                      seq_len=seq_len, y=_np_t(y),
                      full_ref=_np_t(full_ref)).numpy()

    out = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
        jnp.asarray(t), jnp.asarray(ctx),
        y=jnp.asarray(np.transpose(y, (0, 2, 3, 4, 1))),
        full_ref=jnp.asarray(np.transpose(full_ref, (0, 2, 3, 1))))
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, rtol=5e-4, atol=5e-4)


def test_spatial_guidance_matches_reference(ref_mod):
    """FiLM module in isolation (reference only feeds it from its embedded
    OmniMAE extractor; we inject features directly)."""
    torch.manual_seed(3)
    dim, fd = 32, 24
    ref = ref_mod.SpatialGuidanceModule(dim, dino_feature_dim=fd)
    with torch.no_grad():
        ref.gate.add_(torch.randn_like(ref.gate) * 0.3)
        ref.spatial_guide[1].weight.add_(
            torch.randn_like(ref.spatial_guide[1].weight) * 0.1)
    ref.eval()

    rng = np.random.RandomState(3)
    x = rng.randn(2, 10, dim).astype(np.float32)
    feats = rng.randn(2, 7, fd).astype(np.float32)  # shorter -> zero-pad

    with torch.no_grad():
        out_ref = ref(_np_t(x), _np_t(feats), None, False).numpy()

    from more4d_tpu.models.wan_dit import SpatialGuidance
    from more4d_tpu.config import dit_tiny

    cfg = dit_tiny(dim=dim, motion_feature_dim=fd, dtype=jnp.float32,
                   motion_guidance=True)
    m = SpatialGuidance(cfg)
    params = {"params": {
        "spatial_guide": {
            "kernel": ref.spatial_guide[1].weight.detach().numpy().T,
            "bias": ref.spatial_guide[1].bias.detach().numpy(),
        },
        "gate": ref.gate.detach().numpy(),
    }}
    feats_padded = np.concatenate(
        [feats, np.zeros((2, 3, fd), np.float32)], axis=1)
    out = np.asarray(m.apply(params, jnp.asarray(x),
                             jnp.asarray(feats_padded)))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)

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


def test_checkpoint_surgery_48_to_64(ref_mod):
    """Training-from-release workflow: a released Control-style state dict
    (narrow in_dim, no 4D keys) loads into the 4D config. Golden-matches
    the reference surgery (train_wan.py:824-859: zero-pad patch-embed input
    channels, keep bias) and the strict=False fresh init of the 4D
    additions (SpatialGuidanceModule zero FiLM, wan_transformer4d.py:
    749-756) — so the 4D model on [x, y, extra] reproduces the checkpoint
    model's output regardless of the extra channels and MPM features."""
    torch.manual_seed(7)
    dim, ffn, heads, text_dim, fd = 48, 96, 2, 24, 16
    # the "released checkpoint": guidance off -> no spatial_guidance_* /
    # feature_adapter keys, patch_embedding has 20 input channels
    ref = ref_mod.WanTransformer4DModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=20, in_dim=20,
        dim=dim, ffn_dim=ffn, freq_dim=32, text_dim=text_dim, out_dim=16,
        num_heads=heads, num_layers=2, qk_norm=True, cross_attn_norm=True,
        use_dino_guidance=False, use_omnimae_guidance=False)
    ref.eval()
    with torch.no_grad():
        ref.head.head.weight.add_(torch.randn_like(ref.head.head.weight)
                                  * 0.05)
    sd = {k: v for k, v in ref.state_dict().items()}
    assert sd["patch_embedding.weight"].shape[1] == 20
    assert not any("spatial_guidance" in k or "feature_adapter" in k
                   for k in sd)

    cfg = DiTConfig(model_type="t2v", patch_size=(1, 2, 2), text_len=20,
                    in_dim=28, dim=dim, ffn_dim=ffn, freq_dim=32,
                    text_dim=text_dim, out_dim=16, num_heads=heads,
                    num_layers=2, motion_guidance=True,
                    motion_feature_dim=fd, dtype=jnp.float32,
                    attention_backend="xla")
    params = convert_dit_state_dict(sd, cfg)

    # (a) patch-embed surgery golden vs a literal torch transcription of
    # train_wan.py:845-848 (new_w[:, :48] = old_w; new_w[:, 48:] = 0)
    old_w = sd["patch_embedding.weight"]
    new_w = torch.zeros((old_w.shape[0], 28) + old_w.shape[2:])
    new_w[:, :20] = old_w
    got = params["params"]["patch_embedding"]["kernel"]  # (d,h,w,in,out)
    np.testing.assert_array_equal(
        np.transpose(got, (4, 3, 0, 1, 2)), new_w.numpy())
    np.testing.assert_array_equal(
        params["params"]["patch_embedding"]["bias"],
        sd["patch_embedding.bias"].numpy())

    # (b) fresh FiLM init is exact zeros (identity)
    blk = params["params"]["blocks"]["block"]
    for n in ("spatial_guidance_self", "spatial_guidance_ffn"):
        assert (blk[n]["spatial_guide"]["kernel"] == 0).all()
        assert (blk[n]["spatial_guide"]["bias"] == 0).all()
        assert (blk[n]["gate"] == 0).all()
    # fresh feature_adapter: xavier, nonzero, right shapes
    fa = params["params"]["feature_adapter_1"]
    assert fa["kernel"].shape == (3, 3, fd, fd)
    assert np.abs(fa["kernel"]).max() > 0 and (fa["bias"] == 0).all()

    # (c) functional equivalence to the checkpoint model: extra input
    # channels hit zero-padded weights, MPM FiLM is identity
    rng = np.random.RandomState(7)
    b, tt, hh, ww = 1, 3, 8, 8
    x = rng.randn(b, 16, tt, hh, ww).astype(np.float32)
    y = rng.randn(b, 4, tt, hh, ww).astype(np.float32)
    extra = rng.randn(b, 8, tt, hh, ww).astype(np.float32) * 3.0
    t = np.array([250.0], np.float32)
    ctx = rng.randn(b, 20, text_dim).astype(np.float32)
    mpm = rng.randn(b, 4, fd).astype(np.float32)  # 2x2 feature grid

    seq_len = tt * (hh // 2) * (ww // 2)
    with torch.no_grad():
        out_ref = ref(_np_t(x), _np_t(t), context=list(_np_t(ctx)),
                      seq_len=seq_len, y=_np_t(y)).numpy()

    model = WanDiT(cfg)
    y_ext = np.concatenate([y, extra], axis=1)
    out = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
        jnp.asarray(t), jnp.asarray(ctx),
        y=jnp.asarray(np.transpose(y_ext, (0, 2, 3, 4, 1))),
        mpm_features=jnp.asarray(mpm))
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, rtol=5e-4, atol=5e-4)


def test_checkpoint_surgery_truncates_wider_checkpoint(ref_mod):
    """The reference's opposite branch (wan_transformer4d.py:1505-1508):
    a checkpoint wider than the model truncates input channels."""
    torch.manual_seed(8)
    ref = ref_mod.WanTransformer4DModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=20, in_dim=28,
        dim=48, ffn_dim=96, freq_dim=32, text_dim=24, out_dim=16,
        num_heads=2, num_layers=1, qk_norm=True, cross_attn_norm=True,
        use_dino_guidance=False, use_omnimae_guidance=False)
    sd = {k: v for k, v in ref.state_dict().items()}
    cfg = DiTConfig(model_type="t2v", patch_size=(1, 2, 2), text_len=20,
                    in_dim=20, dim=48, ffn_dim=96, freq_dim=32, text_dim=24,
                    out_dim=16, num_heads=2, num_layers=1,
                    motion_guidance=False, dtype=jnp.float32)
    params = convert_dit_state_dict(sd, cfg)
    got = params["params"]["patch_embedding"]["kernel"]
    assert got.shape[3] == 20
    np.testing.assert_array_equal(
        np.transpose(got, (4, 3, 0, 1, 2)),
        sd["patch_embedding.weight"].numpy()[:, :20])

"""Released-Wan-checkpoint first-contact protocol (VERDICT r4 missing #3):
the key manifest is pinned to the EXECUTED reference models' state_dict
keys (the released files are serialized exactly from these modules), and
the strict loader + scripts/check_wan.py CLI are exercised on good, bad,
and surgery-requiring checkpoints."""

import importlib
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
from _ref_loader import load_reference_dit  # noqa: E402

from more4d_tpu.config import DiTConfig, dit_tiny  # noqa: E402
from more4d_tpu.convert.dit_torch import (load_wan_dit_strict,  # noqa: E402
                                          wan_dit_key_manifest)

import jax.numpy as jnp  # noqa: E402


def _tiny_cfg(**kw):
    # clip_dim 1280: the reference hard-codes MLPProj's input width
    # (wan_transformer4d.py:938) regardless of model size
    base = dict(motion_guidance=False, in_dim=48, model_type="i2v",
                num_layers=2, clip_dim=1280, dtype=jnp.float32)
    base.update(kw)
    return dit_tiny(**base)


def _ref_model(ref_mod, in_dim=48, omnimae=False, num_layers=2):
    tcfg = dit_tiny()
    return ref_mod.WanTransformer4DModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=tcfg.text_len,
        in_dim=in_dim, dim=tcfg.dim, ffn_dim=tcfg.ffn_dim,
        freq_dim=tcfg.freq_dim, text_dim=tcfg.text_dim, out_dim=16,
        num_heads=tcfg.num_heads, num_layers=num_layers, qk_norm=True,
        cross_attn_norm=True, use_dino_guidance=False,
        use_omnimae_guidance=omnimae)


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_dit("wan_transformer4d")


def test_manifest_matches_executed_reference_3d(ref_mod):
    """required == the reference 3D-style (no guidance) model's exact
    state_dict key set — what a released Control/InP file contains."""
    torch.manual_seed(0)
    ref = _ref_model(ref_mod, in_dim=48, omnimae=False)
    req, opt = wan_dit_key_manifest(_tiny_cfg())
    assert opt == {}
    assert sorted(req) == sorted(ref.state_dict().keys())


def test_manifest_matches_executed_reference_4d(ref_mod):
    """required + ALL optional groups == the 4D-with-guidance model's keys
    (minus the embedded frozen OmniMAE trunk, which the checker counts as
    external).  The trunk download is stubbed — its contents don't matter,
    only that its keys live under the omnimae_extractor. prefix."""
    om = importlib.import_module("refMoRe4D.models.omnimae")
    orig = om.vit_base_mae_pretraining
    om.vit_base_mae_pretraining = lambda: torch.nn.Linear(4, 4)
    try:
        torch.manual_seed(0)
        ref = _ref_model(ref_mod, in_dim=48, omnimae=True)
    finally:
        om.vit_base_mae_pretraining = orig
    keys = set(ref.state_dict().keys())
    emb = {k for k in keys if k.startswith("omnimae_extractor.")}
    assert emb  # the stub's params did land under the documented prefix
    req, opt = wan_dit_key_manifest(_tiny_cfg(motion_guidance=True))
    expect = set(req) | {k for g in opt.values() for k in g}
    assert sorted(expect) == sorted(keys - emb)
    assert set(opt) == {"spatial_guidance", "feature_adapter"}


def test_strict_loader_surgery_and_fresh_init_groups(ref_mod):
    """A released 48ch 3D checkpoint validates against the in_dim=64 4D
    config: surgery reported, both 4D groups absent -> fresh-init, shapes
    agree with the model graph."""
    torch.manual_seed(1)
    sd = _ref_model(ref_mod, in_dim=48, omnimae=False).state_dict()
    cfg = _tiny_cfg(motion_guidance=True, in_dim=64)
    params, report = load_wan_dit_strict(sd, cfg)
    assert report["ckpt_in_dim"] == 48 and report["model_in_dim"] == 64
    assert "fresh-init" in report["groups"]["spatial_guidance"]
    assert "fresh-init" in report["groups"]["feature_adapter"]
    pe = params["params"]["patch_embedding"]["kernel"]
    assert pe.shape[3] == 64
    np.testing.assert_array_equal(np.asarray(pe[..., 48:, :]), 0.0)


def test_strict_loader_fails_loudly(ref_mod):
    torch.manual_seed(2)
    sd = dict(_ref_model(ref_mod, in_dim=48, omnimae=False).state_dict())
    cfg = _tiny_cfg()

    bad = dict(sd)
    bad["blocks.0.self_attn.q.weight_RENAMED"] = \
        bad.pop("blocks.0.self_attn.q.weight")
    with pytest.raises(ValueError) as e:
        load_wan_dit_strict(bad, cfg)
    assert "blocks.0.self_attn.q.weight" in str(e.value)
    assert "weight_RENAMED" in str(e.value)

    bad = dict(sd)
    bad["head.head.weight"] = torch.zeros(7, 7)
    with pytest.raises(ValueError) as e:
        load_wan_dit_strict(bad, cfg)
    assert "shape mismatch" in str(e.value)
    assert "head" in str(e.value)


def test_strict_loader_partial_group(ref_mod):
    """One missing spatial_guidance key must read as a DRIFTED layout, not
    as a 3D checkpoint."""
    om = importlib.import_module("refMoRe4D.models.omnimae")
    orig = om.vit_base_mae_pretraining
    om.vit_base_mae_pretraining = lambda: torch.nn.Linear(4, 4)
    try:
        torch.manual_seed(3)
        sd = dict(_ref_model(ref_mod, in_dim=48, omnimae=True).state_dict())
    finally:
        om.vit_base_mae_pretraining = orig
    sd.pop("blocks.1.spatial_guidance_ffn.gate")
    with pytest.raises(ValueError) as e:
        load_wan_dit_strict(sd, _tiny_cfg(motion_guidance=True))
    assert "PARTIALLY present" in str(e.value)
    assert "blocks.1.spatial_guidance_ffn.gate" in str(e.value)


def test_check_wan_cli(ref_mod, tmp_path):
    """scripts/check_wan.py end to end: a released-layout 48ch Control
    file validates against the 4D config (rc 0, surgery reported); a
    renamed key reports the structured diff (rc 1)."""
    torch.manual_seed(4)
    sd = _ref_model(ref_mod, in_dim=48, omnimae=False).state_dict()
    good = tmp_path / "control.pth"
    torch.save(sd, good)

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "check_wan.py")
    tcfg = dit_tiny()
    flags = ["--model_size", "tiny", "--variant", "control4d",
             "--num_layers", "2"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    ok = subprocess.run([sys.executable, script, str(good)] + flags,
                        capture_output=True, text=True, env=env)
    assert ok.returncode == 0, ok.stdout + ok.stderr
    assert "OK" in ok.stdout
    assert "surgery" in ok.stdout          # 48 -> 64 reported
    assert "fresh-init" in ok.stdout

    bad_sd = dict(sd)
    bad_sd["time_projection.1.weight_X"] = \
        bad_sd.pop("time_projection.1.weight")
    bad = tmp_path / "control_bad.pth"
    torch.save(bad_sd, bad)
    fail = subprocess.run([sys.executable, script, str(bad)] + flags,
                          capture_output=True, text=True, env=env)
    assert fail.returncode == 1, fail.stdout + fail.stderr
    assert "time_projection.1.weight" in fail.stdout
    assert "FAILED" in fail.stdout
    del tcfg


def test_mpm_extractor_accepts_embedded_prefix(tmp_path):
    """build_mpm_extractor must accept the COMBINED released 4D checkpoint
    (trunk under omnimae_extractor.) identically to a standalone trunk
    file (wan_transformer4d.py:884)."""
    from more4d_tpu.infer.encoders import build_mpm_extractor
    from more4d_tpu.models.omnimae import OMNIMAE_VARIANTS

    # synthesize a tiny standalone trunk state dict in reference layout by
    # shrinking the ViT-B geometry table is overkill here — instead verify
    # the prefix-strip path routes to the same converter by round-tripping
    # the key transformation
    import more4d_tpu.infer.encoders as enc

    captured = {}

    def fake_infer_variant(sd):
        captured["keys"] = sorted(sd)
        raise RuntimeError("stop after prefix handling")

    import more4d_tpu.models.omnimae as om
    orig = om.infer_omnimae_variant
    om.infer_omnimae_variant = fake_infer_variant
    try:
        sd = {"omnimae_extractor.trunk.x": torch.zeros(2),
              "patch_embedding.weight": torch.zeros(1)}
        p = tmp_path / "combined.pth"
        torch.save(sd, p)
        with pytest.raises(RuntimeError):
            enc.build_mpm_extractor(str(p), jit=False)
        assert captured["keys"] == ["trunk.x"]  # prefix stripped, DiT keys dropped
    finally:
        om.infer_omnimae_variant = orig
    del OMNIMAE_VARIANTS

"""The VAE-adaptor and ViSM-LoRA trainer CLIs + VAE roundtrip eval, driven
end-to-end through their core run functions with tiny models (the same seam
the STraG harness test uses)."""

import json
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from more4d_tpu.config import VAEConfig, dit_tiny
from more4d_tpu.data.vism import ViSMSample
from more4d_tpu.models import WanDiT
from more4d_tpu.models.adaptors import VAEDecoderAdaptor, VAEEncoderAdaptor
from more4d_tpu.models.wan_vae import WanVAE

H, W, T = 32, 32, 5


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig(dim=4, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                    temporal_downsample=(False, True, True))
    vae = WanVAE(cfg)
    params = vae.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, T, H, W, 3), jnp.float32))
    return vae, params


@pytest.fixture(scope="module")
def tiny_adaptors():
    enc, dec = VAEEncoderAdaptor(), VAEDecoderAdaptor()
    dummy = jnp.zeros((1, T, H, W, 3), jnp.float32)
    return (enc, enc.init(jax.random.PRNGKey(1), dummy),
            dec, dec.init(jax.random.PRNGKey(2), dummy))


@pytest.mark.parametrize("accum", [1, 2])
def test_train_vae_cli_loop(tiny_vae, tiny_adaptors, tmp_path, accum):
    from train_vae import run_training

    vae, vae_params = tiny_vae
    enc, enc_params, dec, dec_params = tiny_adaptors
    args = types.SimpleNamespace(
        learning_rate=1e-4, kl_scale=1e-6, finetune_vae_decoder=True,
        rec_loss="l1", output_dir=str(tmp_path / "out"), max_steps=3,
        checkpointing_steps=3, log_steps=1, seed=0, resume=False,
        grad_accum_steps=accum, lr_scheduler="constant_with_warmup",
        lr_warmup_steps=1, max_grad_norm=1.0)

    rs = np.random.RandomState(0)

    def samples():
        while True:
            yield rs.randn(T, H, W, 3).astype(np.float32) * 0.1

    trainable = run_training(vae, vae_params, enc, enc_params, dec,
                             dec_params, samples(), args)
    assert "enc" in trainable and "vae_decoder" in trainable
    lines = [json.loads(l) for l in
             open(os.path.join(args.output_dir, "metrics.jsonl"))]
    assert any("train/loss" in l and np.isfinite(l["train/loss"])
               for l in lines)
    from more4d_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(args.output_dir)
    assert mgr.latest_step() == 3
    mgr.close()

    # round trip: the orbax dir feeds the infer CLIs' adaptor loader
    # directly, incl. the fine-tuned VAE decoder subtree
    from more4d_tpu.models.adaptors import load_adaptor

    dec_loaded, vae_ft = load_adaptor(args.output_dir, decoder=True)
    assert vae_ft is not None and "decoder" in vae_ft
    for a, b in zip(jax.tree_util.tree_leaves(trainable["dec"]),
                    jax.tree_util.tree_leaves(dec_loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    enc_loaded, _ = load_adaptor(args.output_dir, decoder=False)
    assert jax.tree_util.tree_structure(enc_loaded) \
        == jax.tree_util.tree_structure(trainable["enc"])


def _vism_sample(seed=0, keep=1.0):
    rs = np.random.RandomState(seed)
    mask = np.zeros((T, H, W, 3), np.float32)
    mask[:, : H // 2] = 1.0
    proj = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    return ViSMSample(
        pixel_values=rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1,
        projected_images=proj, mask=mask,
        mask_pixel_values=proj * (1 - mask) - mask,
        clip_image01=rs.rand(H, W, 3).astype(np.float32),
        text="a room", t2v_keep_flag=keep)


def _text_encoder(dim, length):
    rs = np.random.RandomState(9)
    vocab = jnp.asarray(rs.randn(32, dim), jnp.float32)

    def encode_text(prompts):
        out = np.zeros((len(prompts), length, dim), np.float32)
        for b, p in enumerate(prompts):
            for i, w in enumerate(p.split()[:length]):
                out[b, i] = np.asarray(vocab[hash(w) % 32])
        return jnp.asarray(out)

    return encode_text


def test_prepare_vism_batch_t2v_zeroing(tiny_vae):
    from train_vism import prepare_vism_batch

    vae, vae_params = tiny_vae
    encode_text = _text_encoder(16, 8)
    b1 = prepare_vism_batch(_vism_sample(keep=1.0), vae, vae_params,
                            encode_text, None)
    b0 = prepare_vism_batch(_vism_sample(keep=0.0), vae, vae_params,
                            encode_text, None)
    # 4ch folded mask + z_dim masked-video latents
    assert b1["y"].shape[-1] == 4 + vae.cfg.z_dim
    assert b1["latents"].shape == b1["y"].shape[:-1] + (vae.cfg.z_dim,)
    assert float(jnp.abs(b1["y"]).max()) > 0
    assert float(jnp.abs(b0["y"]).max()) == 0.0  # t2v_flag zeroing


@pytest.mark.parametrize("offload", [False, True])
def test_train_vism_cli_loop(tiny_vae, tmp_path, offload):
    from train_vism import run_training

    vae, vae_params = tiny_vae
    dcfg = dit_tiny(dtype=jnp.float32, in_dim=12, out_dim=4, dim=32,
                    ffn_dim=64, num_heads=2, num_layers=2, text_dim=16,
                    clip_dim=16, text_len=8, motion_guidance=False)
    dit = WanDiT(dcfg)
    lt = (T - 1) // 4 + 1
    base = dit.init(jax.random.PRNGKey(3),
                    jnp.zeros((1, lt, H // 8, W // 8, 4), jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                    jnp.zeros((1, 8, 16), jnp.float32),
                    y=jnp.zeros((1, lt, H // 8, W // 8, 8), jnp.float32))
    # randomize (a fresh DiT has a zero-init head, blocking all gradients;
    # real LoRA training starts from the pretrained InP checkpoint)
    rs = np.random.RandomState(7)
    leaves, td = jax.tree_util.tree_flatten(base)
    base = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rs.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    args = types.SimpleNamespace(
        learning_rate=1e-3, lora_rank=2, lora_alpha=2.0,
        output_dir=str(tmp_path / "out"), max_steps=2,
        checkpointing_steps=2, log_steps=1, seed=0, resume=False,
        offload_blocks=offload)

    def samples():
        i = 0
        while True:
            yield _vism_sample(i)
            i += 1

    lora = run_training(dit, base, vae, vae_params, _text_encoder(16, 8),
                        samples(), args)
    # LoRA factors moved away from zero-init (up starts at zero)
    up_norm = sum(float(jnp.abs(f["up"]).sum())
                  for f in lora["factors"].values())
    assert up_norm > 0
    lines = [json.loads(l) for l in
             open(os.path.join(args.output_dir, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)


def test_trained_lora_loads_into_infer(tiny_vae, tmp_path):
    """Round trip train-here -> infer-here: the orbax LoRA checkpoint a
    trainer run writes loads through load_vism_lora (the infer CLI's
    --vism_lora/--stage1_lora loader) and merges into the base params."""
    from train_vism import run_training

    from more4d_tpu.convert.lora_torch import load_vism_lora
    from more4d_tpu.train.lora import apply_lora

    vae, vae_params = tiny_vae
    dcfg = dit_tiny(dtype=jnp.float32, in_dim=12, out_dim=4, dim=32,
                    ffn_dim=64, num_heads=2, num_layers=2, text_dim=16,
                    clip_dim=16, text_len=8, motion_guidance=False)
    dit = WanDiT(dcfg)
    lt = (T - 1) // 4 + 1
    base = dit.init(jax.random.PRNGKey(3),
                    jnp.zeros((1, lt, H // 8, W // 8, 4), jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                    jnp.zeros((1, 8, 16), jnp.float32),
                    y=jnp.zeros((1, lt, H // 8, W // 8, 8), jnp.float32))
    rs = np.random.RandomState(7)
    leaves, td = jax.tree_util.tree_flatten(base)
    base = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rs.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    out_dir = str(tmp_path / "lora_ckpt")
    args = types.SimpleNamespace(
        learning_rate=1e-2, lora_rank=2, lora_alpha=2.0,
        output_dir=out_dir, max_steps=2, checkpointing_steps=2,
        log_steps=1, seed=0, resume=False, offload_blocks=False)

    def samples():
        i = 0
        while True:
            yield _vism_sample(i)
            i += 1

    trained = run_training(dit, base, vae, vae_params,
                           _text_encoder(16, 8), samples(), args)

    loaded = load_vism_lora(out_dir, dcfg)
    assert loaded["rank"] == 2 and loaded["alpha"] == 2.0
    for k, f in trained["factors"].items():
        np.testing.assert_allclose(np.asarray(f["up"]),
                                   loaded["factors"][k]["up"], rtol=1e-6)
    merged = apply_lora(base, loaded)
    moved = any(float(jnp.abs(a - b).max()) > 0
                for a, b in zip(jax.tree_util.tree_leaves(base),
                                jax.tree_util.tree_leaves(merged)))
    assert moved


def test_load_vism_video_stride2_alignment(tmp_path):
    """Original-clip frames must follow the SAME stride-2-beyond-budget
    sampling as the prerendered renders (wan_dataset.py:606-609 reuses
    _load_video_frames) — a contiguous first-N read would pair original
    frame i with render frame 2i on long clips."""
    from train_vism import load_vism_video

    from more4d_tpu.utils.artifacts import save_videos_grid

    # 12 distinguishable frames (constant intensity i*20)
    src = np.stack([np.full((H, W, 3), i * 20, np.uint8)
                    for i in range(12)])
    path = str(tmp_path / "clip.mp4")
    save_videos_grid(path, src[None], fps=8)

    out = load_vism_video(path, 5, (H, W))
    assert out.shape == (5, H, W, 3)
    # stride-2 picks source frames 0,2,4,6,8 (codec-lossy: wide tolerance)
    want = np.asarray([0, 2, 4, 6, 8]) * 20 / 255.0
    got = out.mean(axis=(1, 2, 3))
    np.testing.assert_allclose(got, want, atol=0.04)

    # short clip: all frames + last-frame padding
    out2 = load_vism_video(path, 16, (H, W))
    assert out2.shape == (16, H, W, 3)
    np.testing.assert_allclose(out2[12:].mean(axis=(1, 2, 3)),
                               [11 * 20 / 255.0] * 4, atol=0.04)


def test_train_vism_cli_loop_text_encoder_lora(tiny_vae, tmp_path):
    """--train_text_encoder through the CLI loop: batches carry input_ids,
    the T5 LoRA tree trains alongside the DiT's, checkpoints round-trip."""
    from train_vism import run_training

    from more4d_tpu.config import T5Config
    from more4d_tpu.models.t5 import WanT5Encoder

    vae, vae_params = tiny_vae
    dcfg = dit_tiny(dtype=jnp.float32, in_dim=12, out_dim=4, dim=32,
                    ffn_dim=64, num_heads=2, num_layers=2, text_dim=16,
                    clip_dim=16, text_len=8, motion_guidance=False)
    dit = WanDiT(dcfg)
    lt = (T - 1) // 4 + 1
    base = dit.init(jax.random.PRNGKey(3),
                    jnp.zeros((1, lt, H // 8, W // 8, 4), jnp.float32),
                    jnp.zeros((1,), jnp.float32),
                    jnp.zeros((1, 8, 16), jnp.float32),
                    y=jnp.zeros((1, lt, H // 8, W // 8, 8), jnp.float32))
    rs = np.random.RandomState(7)
    leaves, td = jax.tree_util.tree_flatten(base)
    base = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rs.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    t5cfg = T5Config(vocab=32, dim=16, dim_attn=16, dim_ffn=32,
                     num_heads=2, num_layers=2, text_len=8,
                     dtype=jnp.float32)
    t5 = WanT5Encoder(t5cfg)
    te_params = t5.init(jax.random.PRNGKey(5), jnp.zeros((1, 8), jnp.int32))

    def tokenize(prompts):
        ids = np.zeros((len(prompts), 8), np.int32)
        for b, p in enumerate(prompts):
            for i, w in enumerate(p.split()[:8]):
                ids[b, i] = hash(w) % 32
        return jnp.asarray(ids), jnp.ones((len(prompts), 8), jnp.float32)

    args = types.SimpleNamespace(
        learning_rate=1e-2, lora_rank=2, lora_alpha=2.0,
        output_dir=str(tmp_path / "te"), max_steps=2,
        checkpointing_steps=2, log_steps=1, seed=0, resume=False,
        offload_blocks=False, train_text_encoder=True,
        lora_skip_name=None)

    def samples():
        i = 0
        while True:
            yield _vism_sample(i)
            i += 1

    lora = run_training(dit, base, vae, vae_params, None, samples(), args,
                        text_encoder=t5, te_params=te_params,
                        tokenize=tokenize)
    for part in ["dit", "te"]:
        up_norm = sum(float(jnp.abs(f["up"]).sum())
                      for f in lora[part]["factors"].values())
        assert up_norm > 0, f"{part} LoRA never moved"


def test_infer_vae_evaluate(tiny_vae, tiny_adaptors, tmp_path, capsys):
    from infer_vae import evaluate

    vae, vae_params = tiny_vae
    enc, enc_params, dec, dec_params = tiny_adaptors
    args = types.SimpleNamespace(output_dir=str(tmp_path / "eval"),
                                 max_samples=2)
    rs = np.random.RandomState(1)

    def samples():
        for i in range(3):
            yield f"s{i}", rs.randn(T, H, W, 3).astype(np.float32) * 0.1

    summary = evaluate(vae, vae_params, enc, enc_params, dec, dec_params,
                       samples(), args)
    assert summary["extra"]["n"] == 2
    assert np.isfinite(summary["value"])
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])["unit"] == "mean-EPE"


def test_infer_vae_render_types(tmp_path):
    """--render_type {project,3dgs,both} roundtrip videos (reference
    infer_vae.py:33-34): both renderers produce the advertised artifact
    set from the same flow pair."""
    from infer_vae import build_render_fn

    args = types.SimpleNamespace(output_dir=str(tmp_path), height=32,
                                 width=32, render_type="both",
                                 gs_scale=1e-4)
    rs = np.random.RandomState(0)
    flow = rs.randn(3, 32, 32, 3).astype(np.float32) * 0.05
    build_render_fn(args)("s0", flow, flow + 0.01)
    wrote = sorted(os.listdir(tmp_path))
    assert "s0_roundtrip.mp4" in wrote and "s0_roundtrip_gs.mp4" in wrote

    args.render_type = "3dgs"
    build_render_fn(args)("s1", flow, flow)
    wrote = sorted(os.listdir(tmp_path))
    assert "s1_roundtrip_gs.mp4" in wrote and "s1_roundtrip.mp4" not in wrote

"""Streamed-base LoRA training (train/lora_streamed.py).

The load-bearing claim: a train step whose frozen base streams from host
memory computes THE SAME LoRA gradients/updates as the fully-resident
trainer (train_vism.py make_vism_train_step) — the memory layout changes,
the math must not (VERDICT r2 next-step #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from more4d_tpu.config import dit_tiny
from more4d_tpu.models.wan_dit import WanDiT
from more4d_tpu.train.lora import create_lora, lora_param_count
from more4d_tpu.train.lora_streamed import (StreamedLoRATrainer,
                                            lora_block_paths,
                                            make_streamed_lora_trainer)
from more4d_tpu.train.train_vism import VismTrainConfig, make_vism_train_step


def _setup(motion=False, dtype=jnp.float32, **cfg_kw):
    # InP geometry (the reference's ViSM LoRA target is the 14B InP:
    # 4D_ViSM_training/train.py:859-868): i2v, 20ch y, no motion guidance
    cfg = dit_tiny(motion_guidance=motion, model_type="i2v", dtype=dtype,
                   param_dtype=dtype, num_layers=2, text_len=24,
                   clip_tokens=9, **cfg_kw)
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(0)
    b, lt, lh, lw = 1, 3, 8, 8
    ks = jax.random.split(rng, 6)
    batch = {
        "latents": jax.random.normal(ks[0], (b, lt, lh, lw, 16),
                                     jnp.float32),
        "y": jax.random.normal(ks[1], (b, lt, lh, lw, 48), dtype),
        "context": jax.random.normal(ks[2], (b, cfg.text_len, cfg.text_dim),
                                     jnp.float32),
        "clip_fea": jax.random.normal(ks[3], (b, cfg.clip_tokens,
                                              cfg.clip_dim), dtype),
    }
    if motion:
        batch["mpm_features"] = jax.random.normal(
            ks[4], (b, 16, cfg.motion_feature_dim), dtype)
    params = model.init(ks[5], batch["latents"], jnp.zeros((1,)),
                        batch["context"], y=batch["y"],
                        clip_fea=batch["clip_fea"],
                        mpm_features=batch.get("mpm_features"))

    # fresh init zero-inits the output head (and FiLM gates), which makes
    # d loss/d tokens identically zero — gradient tests would be vacuous.
    # Fill every all-zero leaf with small noise, as a trained checkpoint
    # would have.
    rs = np.random.RandomState(11)
    params = jax.tree.map(
        lambda a: jnp.asarray(rs.randn(*a.shape) * 0.02, a.dtype)
        if float(jnp.abs(a).max()) == 0 else a, params)
    return model, params, batch


@pytest.mark.parametrize("fused_qkv", [True, False])
@pytest.mark.parametrize("bwd_chunk", [4, 1])
def test_streamed_lora_step_matches_resident(bwd_chunk, fused_qkv):
    """Two steps of the streamed trainer == two steps of the resident
    LoRA trainer: same loss, same updated factors — starting from
    RANDOMIZED (nonzero-up) factors so a projection whose LoRA were
    silently dropped would move the loss (the fused-qkv q/k/v kernels go
    through _ProjParams, not Dense, and an earlier interceptor missed
    them entirely — zero-init up masked it).

    bwd_chunk=4 on the 2-layer model takes the single-partial-chunk
    Python-slice path; bwd_chunk=1 forces TWO full chunks through
    _slice_factor_chunk's lax.dynamic_slice, the reverse cotangent
    chaining, and the chunks.reverse()+concatenate reassembly — the
    code path the real 40-layer 14B job runs (review finding r3)."""
    model, params, batch = _setup(fused_qkv=fused_qkv)
    # SGD keeps the comparison linear in the gradients — adamw divides by
    # sqrt(v)+eps, which amplifies O(1e-7) fp-association noise on
    # near-zero gradient elements into O(lr)-scale factor differences
    tx = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(42)

    # resident reference: make_vism_train_step on the scanned model.
    # Randomize BOTH factor halves: with up=0 a dropped projection's LoRA
    # is invisible to the forward and barely visible after 2 SGD steps.
    lora0 = create_lora(params, jax.random.PRNGKey(7))
    rs = np.random.RandomState(3)
    lora0["factors"] = {
        k: {"down": jnp.asarray(rs.randn(*np.shape(f["down"])) * 0.05,
                                jnp.float32),
            "up": jnp.asarray(rs.randn(*np.shape(f["up"])) * 0.05,
                              jnp.float32)}
        for k, f in lora0["factors"].items()}
    vcfg = VismTrainConfig()
    ref_step = jax.jit(make_vism_train_step(model, tx, vcfg),
                       static_argnums=(5,))
    lora_r = jax.tree.map(lambda a: a, lora0)
    opt_r = tx.init(lora_r["factors"])
    losses_r = []
    for i in range(2):
        lora_r, opt_r, m = ref_step(lora_r, opt_r, params, batch,
                                    jax.random.fold_in(rng, i), 0)
        losses_r.append(float(m["loss"]))

    # streamed: same factors, base blocks parked on host unquantized
    trainer, lora_s, opt_s = make_streamed_lora_trainer(
        model, params, tx, jax.random.PRNGKey(7), quantize="none",
        bwd_chunk=bwd_chunk)
    lora_s = {**lora_s, "factors": jax.tree.map(lambda a: a,
                                                lora0["factors"])}
    opt_s = tx.init(lora_s["factors"])
    losses_s = []
    for i in range(2):
        lora_s, opt_s, m = trainer.train_step(
            lora_s, opt_s, batch, jax.random.fold_in(rng, i))
        losses_s.append(float(m["loss"]))

    np.testing.assert_allclose(losses_s, losses_r, rtol=1e-5)
    # the streamed path applies LoRA as a side-path (x@W + s(x@d)@u) while
    # the resident path merges (x@(W+sD)) — identical math, different fp32
    # summation order, so updated factors agree to ~1e-5 abs not bit-exact
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        rtol=2e-4, atol=1e-5),
        lora_s["factors"], lora_r["factors"])


def test_streamed_lora_motion_variant():
    """4D (motion-guidance) variant trains too — the 14B Control model is
    the 4D-STraG fine-tune target (train_wan.py:689-720)."""
    model, params, batch = _setup(motion=True)
    tx = optax.sgd(1e-2)
    trainer, lora, opt = make_streamed_lora_trainer(
        model, params, tx, jax.random.PRNGKey(1), quantize="none")
    before = jax.tree.map(lambda a: np.asarray(a), lora["factors"])
    lora, opt, m = trainer.train_step(lora, opt, batch,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    # up factors start zero -> only down receives nonzero grads through
    # up=0 at step 1? No: d/d(down) goes through up=0 so is zero; d/d(up)
    # through down!=0 is nonzero. Check SOME factor moved.
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - b).max()) > 0,
        lora["factors"], before)
    assert any(v["up"] for v in moved.values()), "no up factor moved"


def test_streamed_density_sampling_and_skip_name():
    """The streamed trainer honors the SD3 density/weighting config and
    --lora_skip_name like the resident trainer (review findings r3: both
    were silently ignored on the --offload_blocks path)."""
    model, params, batch = _setup()
    tx = optax.sgd(1e-2)
    trainer, lora, opt = make_streamed_lora_trainer(
        model, params, tx, jax.random.PRNGKey(1), quantize="none",
        skip_name="ffn", uniform_sampling=False,
        weighting_scheme="cosmap")
    assert not any("ffn" in p for p in lora["factors"])
    assert any("self_attn" in p for p in lora["factors"])
    lora, opt, m = trainer.train_step(lora, opt, batch,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))

    # same rng under scheme 'none': the cosmap weighting must change the
    # loss (proves the weighting actually reaches the streamed loss tail)
    trainer2, lora2, opt2 = make_streamed_lora_trainer(
        model, params, tx, jax.random.PRNGKey(1), quantize="none",
        skip_name="ffn", uniform_sampling=False,
        weighting_scheme="none")
    _, _, m2 = trainer2.train_step(lora2, opt2, batch,
                                   jax.random.PRNGKey(3))
    assert float(m["loss"]) != float(m2["loss"])


def test_acts_on_host_matches_device_resident():
    """Parking saved activations in pinned host memory between the walks
    (the 14B HBM-relief mode) must not change the math."""
    model, params, batch = _setup()
    tx = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(5)
    outs = []
    for host in (False, True):
        trainer, lora, opt = make_streamed_lora_trainer(
            model, params, tx, jax.random.PRNGKey(7), quantize="none",
            acts_on_host=host)
        lora, opt, m = trainer.train_step(lora, opt, batch, rng)
        outs.append((float(m["loss"]), lora["factors"]))
    assert outs[0][0] == outs[1][0]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        outs[0][1], outs[1][1])


def test_fp8_streamed_lora_runs():
    """fp8-quantized base still trains (the 14B single-chip config)."""
    model, params, batch = _setup()
    tx = optax.adamw(1e-3)
    trainer, lora, opt = make_streamed_lora_trainer(
        model, params, tx, jax.random.PRNGKey(1), quantize="fp8")
    lora, opt, m = trainer.train_step(lora, opt, batch,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_lora_block_paths():
    model, params, _ = _setup()
    lora = create_lora(params, jax.random.PRNGKey(0))
    rel2full = lora_block_paths(lora["factors"])
    assert len(rel2full) == len(lora["factors"])
    assert all(not k.startswith("params/") for k in rel2full)
    assert "self_attn/q/kernel" in rel2full
    assert lora_param_count(lora) > 0

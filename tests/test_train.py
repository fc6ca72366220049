"""Training subsystem: LoRA math, stratified sampler, loss guards, and one
step of each trainer (tiny configs, loss decreases / stays finite)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from more4d_tpu.config import VAEConfig, dit_tiny
from more4d_tpu.models import WanDiT
from more4d_tpu.models.adaptors import VAEDecoderAdaptor, VAEEncoderAdaptor
from more4d_tpu.models.wan_vae import WanVAE
from more4d_tpu.train import (StratifiedTimestepSampler, apply_lora,
                              create_lora, custom_mse_loss,
                              dynamic_clip_norm, ema_update,
                              LossOutlierTracker, make_adamw)
from more4d_tpu.train.train_straag import (StraagTrainConfig, make_train_step,
                                           training_schedule)
from more4d_tpu.train.train_vae import (VAEAdaptorTrainConfig,
                                        make_vae_adaptor_train_step)
from more4d_tpu.train.train_vism import VismTrainConfig, make_vism_train_step


def _dit_and_params(in_dim=24, motion=False, seed=0):
    cfg = dit_tiny(dtype=jnp.float32, in_dim=in_dim, out_dim=4, dim=32,
                   ffn_dim=64, num_heads=2, num_layers=2, text_dim=16,
                   clip_dim=16, text_len=8, motion_guidance=motion)
    model = WanDiT(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.zeros((1, 3, 8, 8, 4), jnp.float32)
    y = jnp.zeros((1, 3, 8, 8, in_dim - 4), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 8, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x, t, ctx, y=y)
    leaves, td = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rng.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    return model, params, cfg


def test_lora_zero_init_is_identity():
    model, params, cfg = _dit_and_params()
    lora = create_lora(params, jax.random.PRNGKey(0), rank=2)
    assert len(lora["factors"]) > 0
    merged = apply_lora(params, lora)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_lora_merge_math():
    params = {"blocks": {"block": {"self_attn": {"q": {
        "kernel": jnp.ones((4, 4))}}}}}
    lora = create_lora(params, jax.random.PRNGKey(1), rank=2, alpha=2.0)
    key = "blocks/block/self_attn/q/kernel"
    lora["factors"][key]["up"] = jnp.ones((2, 4))
    merged = apply_lora(params, lora, multiplier=0.5)
    expected = np.ones((4, 4)) + 0.5 * (2.0 / 2) * np.asarray(
        lora["factors"][key]["down"] @ jnp.ones((2, 4)))
    np.testing.assert_allclose(
        np.asarray(merged["blocks"]["block"]["self_attn"]["q"]["kernel"]),
        expected, rtol=1e-5)


def test_stratified_sampler_intervals():
    s = StratifiedTimestepSampler(1000, uniform_sampling=True, world_size=4)
    assert s.group_num == 4 and s.sigma_interval == 250
    for rank in range(4):
        idx = np.asarray(s(jax.random.PRNGKey(rank), 64, rank=rank))
        assert idx.min() >= rank * 250 and idx.max() < (rank + 1) * 250


def test_dynamic_clip_shrinks_on_anomaly():
    g = {"w": jnp.ones((10,)) * 100.0}
    clipped, norm, used = dynamic_clip_norm(g, step=2000,
                                            max_grad_norm=0.05,
                                            decay_steps=1000)
    n = float(jnp.sqrt(jnp.sum(jnp.square(clipped["w"]))))
    assert n <= 0.05 + 1e-5
    assert float(used) < 0.05  # shrunk below the nominal limit


def test_custom_mse_threshold_masks_outliers():
    pred = jnp.asarray([0.0, 100.0])
    tgt = jnp.asarray([1.0, 0.0])
    loss = custom_mse_loss(pred, tgt, threshold=50.0)
    assert float(loss) == pytest.approx(0.5)  # only the first element counts


def test_loss_outlier_tracker():
    t = LossOutlierTracker(window=50, sigma=6.0, warmup=5)
    for _ in range(20):
        assert not t.should_skip(1.0 + np.random.rand() * 0.01)
    assert t.should_skip(100.0)
    assert t.should_skip(float("nan"))


def test_loss_outlier_tracker_absolute_and_degenerate_std():
    """should_skip_batch parity (train_vae.py:82,87-97): the absolute
    ceiling applies even before the statistical warmup, and a degenerate
    window (std < 1e-6) falls back to mean * multiplier instead of
    mean + sigma*std (which would reject everything above the mean)."""
    t = LossOutlierTracker(window=50, sigma=6.0, warmup=5,
                           absolute_threshold=1e7, multiplier=10.0)
    # absolute threshold fires on the very first sample (train_vae.py:82)
    assert t.should_skip(2e7)
    assert not t.should_skip(1.0)

    # constant window -> std == 0 -> threshold = mean * multiplier
    t2 = LossOutlierTracker(window=50, sigma=6.0, warmup=5,
                            multiplier=10.0)
    for _ in range(10):
        assert not t2.should_skip(1.0)
    # > mean + 6*std (= 1.0) but < mean * 10 -> kept (the reference's
    # early-training guard: without it nothing above the mean survives)
    assert not t2.should_skip(5.0)
    assert t2.should_skip(50.0)  # > mean * 10 -> skipped


def test_sd3_loss_weighting_golden():
    """loss_weighting_sd3 vs a literal torch transcription of diffusers'
    compute_loss_weighting_for_sd3 (the reference applies it at
    train_wan.py:1964; diffusers is not installed here, so the
    transcription is the golden)."""
    import math
    import torch
    from more4d_tpu.train.sampler import loss_weighting_sd3

    def torch_golden(scheme, sigmas):
        if scheme == "sigma_sqrt":
            return (sigmas ** -2.0).float()
        if scheme == "cosmap":
            bot = 1 - 2 * sigmas + 2 * sigmas ** 2
            return 2 / (math.pi * bot)
        return torch.ones_like(sigmas)

    sig = np.random.RandomState(0).uniform(1e-3, 1.0, (16,)).astype(np.float32)
    for scheme in ["sigma_sqrt", "cosmap", "none", "logit_normal", "mode"]:
        got = np.asarray(loss_weighting_sd3(scheme, jnp.asarray(sig)))
        want = torch_golden(scheme, torch.from_numpy(sig)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_timestep_density_u_distributions():
    """timestep_density_u matches the diffusers transforms: logit_normal
    is sigmoid-of-normal (moment check), 'mode' applies the exact
    deterministic warp to uniform draws (checked by inverting against a
    numpy transcription on the same quantiles), 'none' is U[0,1)."""
    from more4d_tpu.train.sampler import timestep_density_u

    n = 50_000
    u_ln = np.asarray(timestep_density_u(
        jax.random.PRNGKey(0), "logit_normal", n,
        logit_mean=0.3, logit_std=0.7))
    # golden: sigmoid(N(0.3, 0.7)) moments from numpy
    z = np.random.RandomState(1).normal(0.3, 0.7, n)
    want = 1 / (1 + np.exp(-z))
    assert abs(u_ln.mean() - want.mean()) < 5e-3
    assert abs(u_ln.std() - want.std()) < 5e-3
    assert 0.0 < u_ln.min() and u_ln.max() < 1.0

    u_mode = np.asarray(timestep_density_u(
        jax.random.PRNGKey(2), "mode", n, mode_scale=1.29))
    # the mode warp is deterministic in the underlying uniform draw:
    # compare quantile curves against the numpy transcription
    base = np.sort(np.asarray(jax.random.uniform(jax.random.PRNGKey(2),
                                                 (n,))))
    warped = 1 - base - 1.29 * (np.cos(np.pi * base / 2) ** 2 - 1 + base)
    np.testing.assert_allclose(np.sort(u_mode), np.sort(warped), atol=1e-5)

    u_none = np.asarray(timestep_density_u(jax.random.PRNGKey(3), "none", n))
    assert abs(u_none.mean() - 0.5) < 5e-3


@pytest.mark.slow
def test_straag_step_density_sampling_and_weighting():
    """--no-uniform_sampling + cosmap: the step runs, the loss is finite,
    and the cosmap weighting actually changes the loss vs 'none' at the
    same rng (weighting != ones)."""
    model, params, cfg = _dit_and_params(in_dim=24)
    tx = make_adamw(1e-3)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 3, 8, 8, 4), jnp.float32),
        "y": jnp.asarray(rng.randn(2, 3, 8, 8, 20), jnp.float32),
        "context": jnp.asarray(rng.randn(2, 8, 16), jnp.float32),
    }
    losses = {}
    for scheme in ["none", "cosmap"]:
        tcfg = StraagTrainConfig(abnormal_loss_threshold=1e9,
                                 uniform_sampling=False,
                                 weighting_scheme=scheme, use_ema=False)
        step = make_train_step(model, tx, tcfg)
        _, _, _, m = step(params, opt_state, None, batch,
                          jax.random.PRNGKey(7), 10)
        losses[scheme] = float(m["loss"])
        assert np.isfinite(losses[scheme])
    assert losses["none"] != losses["cosmap"]


def test_training_schedule_shift():
    s = training_schedule(1000, 5.0)
    assert s.shape == (1000,)
    assert s[0] == pytest.approx(1.0)
    assert s[-1] == pytest.approx(5.0 * 0.001 / (1 + 4 * 0.001), rel=1e-4)


@pytest.mark.slow
def test_straag_step_runs_and_skips_abnormal():
    model, params, cfg = _dit_and_params(in_dim=24)
    tcfg = StraagTrainConfig(abnormal_loss_threshold=1e9)  # never skip
    tx = make_adamw(1e-3)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(lambda x: x, params)
    step = make_train_step(model, tx, tcfg)
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 3, 8, 8, 4), jnp.float32),
        "y": jnp.asarray(rng.randn(2, 3, 8, 8, 20), jnp.float32),
        "context": jnp.asarray(rng.randn(2, 8, 16), jnp.float32),
    }
    p1, o1, e1, m1 = step(params, opt_state, ema, batch,
                          jax.random.PRNGKey(0), 10)
    assert np.isfinite(float(m1["loss"]))
    assert not bool(m1["skipped"])
    # params changed
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               params, p1)
    assert max(jax.tree_util.tree_leaves(d)) > 0

    # abnormal loss -> update skipped (threshold 0 => any loss skips)
    tcfg2 = StraagTrainConfig(abnormal_loss_threshold=0.0,
                              abnormal_loss_start_step=0)
    step2 = make_train_step(model, tx, tcfg2)
    p2, o2, e2, m2 = step2(params, opt_state, ema, batch,
                           jax.random.PRNGKey(0), 100)
    assert bool(m2["skipped"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_vism_lora_step_only_touches_lora():
    model, params, cfg = _dit_and_params(in_dim=12)
    lora = create_lora(params, jax.random.PRNGKey(2), rank=2)
    tcfg = VismTrainConfig()
    tx = optax.adamw(1e-3)
    opt_state = tx.init(lora["factors"])
    step = make_vism_train_step(model, tx, tcfg)
    rng = np.random.RandomState(1)
    batch = {
        "latents": jnp.asarray(rng.randn(1, 3, 8, 8, 4), jnp.float32),
        "y": jnp.asarray(rng.randn(1, 3, 8, 8, 8), jnp.float32),
        "context": jnp.asarray(rng.randn(1, 8, 16), jnp.float32),
    }
    lora2, _, metrics = step(lora, opt_state, params, batch,
                             jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(lora["factors"]),
                        jax.tree_util.tree_leaves(lora2["factors"])))
    assert changed


@pytest.mark.slow
def test_straag_step_camera_conditioning():
    """control_camera_ref training (train_wan.py:1651-1671,1940-1950): a
    batch carrying folded Plücker maps as 'y_camera' reaches the DiT's
    control adapter — the step runs and the camera input affects the
    loss."""
    from more4d_tpu.config import dit_tiny
    from more4d_tpu.models import WanDiT

    cfg = dit_tiny(dtype=jnp.float32, control_adapter=True, text_len=8,
                   in_dim=24, out_dim=4, dim=32, ffn_dim=64, num_heads=2,
                   num_layers=2, text_dim=16, clip_dim=16)
    model = WanDiT(cfg)
    rs = np.random.RandomState(0)
    x = jnp.zeros((1, 3, 8, 8, 4), jnp.float32)
    y = jnp.zeros((1, 3, 8, 8, 20), jnp.float32)
    cam = jnp.asarray(rs.randn(1, 3, 8, 8, 24), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((1,), jnp.float32),
                        jnp.zeros((1, 8, 16), jnp.float32), y=y,
                        y_camera=cam)
    leaves, td = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rs.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    tx = make_adamw(1e-3)
    opt_state = tx.init(params)
    tcfg = StraagTrainConfig(abnormal_loss_threshold=1e9, use_ema=False)
    step = make_train_step(model, tx, tcfg)
    batch = {
        "latents": jnp.asarray(rs.randn(2, 3, 8, 8, 4), jnp.float32),
        "y": jnp.asarray(rs.randn(2, 3, 8, 8, 20), jnp.float32),
        "context": jnp.asarray(rs.randn(2, 8, 16), jnp.float32),
        "y_camera": jnp.asarray(rs.randn(2, 3, 8, 8, 24), jnp.float32),
    }
    _, _, _, m1 = step(params, opt_state, None, batch,
                       jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(m1["loss"]))
    batch2 = dict(batch, y_camera=batch["y_camera"] * 0 + 1)
    _, _, _, m2 = step(params, opt_state, None, batch2,
                       jax.random.PRNGKey(1), 0)
    assert float(m1["loss"]) != float(m2["loss"])


def test_create_lora_skip_name():
    """--lora_skip_name: kernels whose path contains the substring get no
    LoRA factors (lora_utils.py:205)."""
    model, params, cfg = _dit_and_params(in_dim=12)
    full = create_lora(params, jax.random.PRNGKey(0), rank=2)
    skipped = create_lora(params, jax.random.PRNGKey(0), rank=2,
                          skip_name="ffn")
    assert any("ffn" in p for p in full["factors"])
    assert not any("ffn" in p for p in skipped["factors"])
    assert 0 < len(skipped["factors"]) < len(full["factors"])


@pytest.mark.slow
def test_vism_step_motion_sub_and_came():
    """ViSM step with --optimizer came + --motion_sub_loss: runs, loss is
    finite and differs from the plain-MSE loss at the same rng."""
    from more4d_tpu.train.optim import came

    model, params, cfg = _dit_and_params(in_dim=12)
    lora = create_lora(params, jax.random.PRNGKey(2), rank=2)
    rng = np.random.RandomState(1)
    batch = {
        "latents": jnp.asarray(rng.randn(1, 3, 8, 8, 4), jnp.float32),
        "y": jnp.asarray(rng.randn(1, 3, 8, 8, 8), jnp.float32),
        "context": jnp.asarray(rng.randn(1, 8, 16), jnp.float32),
    }
    tx = came(1e-3)
    opt_state = tx.init(lora["factors"])
    losses = {}
    for ms in [False, True]:
        tcfg = VismTrainConfig(motion_sub_loss=ms)
        step = make_vism_train_step(model, tx, tcfg)
        lora2, _, m = step(lora, opt_state, params, batch,
                           jax.random.PRNGKey(3))
        losses[ms] = float(m["loss"])
        assert np.isfinite(losses[ms])
        changed = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree_util.tree_leaves(lora["factors"]),
                            jax.tree_util.tree_leaves(lora2["factors"])))
        assert changed
    assert losses[False] != losses[True]


@pytest.mark.slow
def test_vism_step_trains_text_encoder_lora():
    """--train_text_encoder: the umT5 tower is applied inside the loss
    with its own LoRA; one step moves BOTH factor trees (te 'up' starts
    zero and becomes nonzero) while both base trees stay frozen."""
    from more4d_tpu.config import T5Config
    from more4d_tpu.models.t5 import WanT5Encoder
    from more4d_tpu.train.train_vism import TE_LORA_TARGETS

    model, params, cfg = _dit_and_params(in_dim=12)
    t5cfg = T5Config(vocab=64, dim=16, dim_attn=16, dim_ffn=32,
                     num_heads=2, num_layers=2, text_len=8,
                     dtype=jnp.float32)
    t5 = WanT5Encoder(t5cfg)
    te_params = t5.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 8), jnp.int32))

    lora = {"dit": create_lora(params, jax.random.PRNGKey(2), rank=2),
            "te": create_lora(te_params, jax.random.PRNGKey(3), rank=2,
                              targets=TE_LORA_TARGETS)}
    assert lora["te"]["factors"], "TE target regex matched no kernels"
    tx = optax.adamw(1e-2)
    opt_state = tx.init({"dit": lora["dit"]["factors"],
                         "te": lora["te"]["factors"]})
    tcfg = VismTrainConfig()
    step = make_vism_train_step(model, tx, tcfg, text_encoder=t5)
    rng = np.random.RandomState(1)
    batch = {
        "latents": jnp.asarray(rng.randn(1, 3, 8, 8, 4), jnp.float32),
        "y": jnp.asarray(rng.randn(1, 3, 8, 8, 8), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, 64, (1, 8)), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.float32),
    }
    base = {"dit": params, "te": te_params}
    lora2, _, m = step(lora, opt_state, base, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["loss"]))
    te_up_moved = any(
        float(jnp.abs(f["up"]).max()) > 0
        for f in lora2["te"]["factors"].values())
    assert te_up_moved, "no gradient reached the text-encoder LoRA"
    dit_moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(lora["dit"]["factors"]),
                        jax.tree_util.tree_leaves(lora2["dit"]["factors"])))
    assert dit_moved


@pytest.mark.slow
def test_vae_adaptor_step_decreases_loss():
    vcfg = VAEConfig(dim=4, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                     temporal_downsample=(True,))
    vae = WanVAE(vcfg)
    rng = np.random.RandomState(2)
    flow = jnp.asarray(rng.randn(1, 5, 16, 16, 3) * 0.1, jnp.float32)
    vae_params = vae.init(jax.random.PRNGKey(0), flow)

    enc = VAEEncoderAdaptor(ch=8)
    dec = VAEDecoderAdaptor(ch=8)
    enc_p = enc.init(jax.random.PRNGKey(1), flow)
    dec_p = dec.init(jax.random.PRNGKey(2), flow)
    trainable = {"enc": enc_p, "dec": dec_p,
                 "vae_decoder": {"decoder": vae_params["params"]["decoder"],
                                 "conv2": vae_params["params"]["conv2"]}}
    tcfg = VAEAdaptorTrainConfig(learning_rate=1e-3)
    tx = optax.adam(1e-3)
    opt_state = tx.init(trainable)
    step = jax.jit(make_vae_adaptor_train_step(enc, dec, vae, tx, tcfg))

    batch = {"flow": flow}
    losses = []
    tr = trainable
    for i in range(4):
        tr, opt_state, m = step(tr, opt_state, vae_params, batch,
                                jax.random.PRNGKey(10 + i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_came_optimizer_converges_and_is_factored():
    """CAME (train_wan.py:1129-1136 --use_came): converges on a quadratic;
    matrix params carry factored O(rows+cols) statistics."""
    from more4d_tpu.train import came

    rs = np.random.RandomState(0)
    target = jnp.asarray(rs.randn(16, 32), jnp.float32)
    params = {"w": jnp.zeros((16, 32), jnp.float32),
              "b": jnp.zeros((32,), jnp.float32)}
    tx = came(5e-2, weight_decay=0.0)
    state = tx.init(params)
    # factored stats for the matrix, full for the vector
    assert state["leaves"]["w"]["v_r"].shape == (16,)
    assert state["leaves"]["w"]["v_c"].shape == (32,)
    assert "v" in state["leaves"]["b"]
    # official CAME: no instability stats for non-factored tensors
    # (their update is the first moment directly)
    assert "r" not in state["leaves"]["b"]

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss

    first = None
    for i in range(300):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.05 * first, (first, float(loss))


def test_came_on_scan_stacked_kernels():
    """3D [layers, in, out] stacks factor over the last two dims."""
    from more4d_tpu.train import came

    p = {"k": jnp.ones((4, 8, 16), jnp.float32)}
    tx = came(1e-3)
    s = tx.init(p)
    assert s["leaves"]["k"]["v_r"].shape == (4, 8)
    assert s["leaves"]["k"]["v_c"].shape == (4, 16)
    g = {"k": jnp.ones((4, 8, 16), jnp.float32)}
    upd, s = tx.update(g, s, p)
    assert np.isfinite(np.asarray(upd["k"])).all()


def test_lr_schedule_shapes():
    """make_lr_schedule: the reference's get_scheduler subset
    (train_wan.sh:27-28 ships constant_with_warmup + 100 warmup steps)."""
    from more4d_tpu.train.optim import make_lr_schedule, scale_lr

    assert make_lr_schedule(3e-4, "constant") == 3e-4  # plain float
    # like diffusers get_scheduler, plain 'constant' IGNORES warmup_steps
    assert make_lr_schedule(3e-4, "constant", warmup_steps=100) == 3e-4
    s = make_lr_schedule(1.0, "constant_with_warmup", warmup_steps=10,
                         total_steps=100)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 0.5) < 1e-6
    assert float(s(10)) == 1.0 and float(s(70)) == 1.0
    c = make_lr_schedule(1.0, "cosine", warmup_steps=10, total_steps=110)
    assert abs(float(c(10)) - 1.0) < 1e-6
    assert float(c(110)) < 1e-3
    lin = make_lr_schedule(2.0, "linear", warmup_steps=0, total_steps=10)
    assert abs(float(lin(5)) - 1.0) < 1e-6
    # two-tier LR composes with schedules (with_low_lr -> scale_lr)
    assert abs(float(scale_lr(s, 0.1)(10)) - 0.1) < 1e-7
    assert scale_lr(2.0, 0.5) == 1.0


def test_scheduled_lr_drives_adamw_and_came():
    """Warmup step 0 must produce a ZERO update for both optimizers (lr=0),
    and a nonzero one at step 1 — proves the schedule reaches the update
    rule (incl. the custom CAME transform's count-indexed lookup)."""
    from more4d_tpu.train import came
    from more4d_tpu.train.optim import make_adamw, make_lr_schedule

    p = {"w": jnp.ones((4, 4), jnp.float32)}
    g = {"w": jnp.full((4, 4), 0.1, jnp.float32)}
    for name, mk in (("adamw", lambda lr: make_adamw(lr)),
                     ("came", came)):
        tx = mk(make_lr_schedule(1e-2, "constant_with_warmup",
                                 warmup_steps=5, total_steps=100))
        st = tx.init(p)
        upd0, st = tx.update(g, st, p)
        assert float(jnp.abs(upd0["w"]).max()) < 1e-9, name
        upd1, st = tx.update(g, st, p)
        assert float(jnp.abs(upd1["w"]).max()) > 1e-5, name


def test_split_train_step_matches_fused():
    """make_split_train_step (the relay server-compiler workaround for the
    named-save remat policies) must produce the same params/loss as the
    fused make_train_step on identical inputs."""
    import optax

    from more4d_tpu.config import dit_tiny
    from more4d_tpu.models import WanDiT
    from more4d_tpu.train.train_straag import (StraagTrainConfig,
                                               make_split_train_step,
                                               make_train_step,
                                               should_skip_update)

    cfg = dit_tiny(dtype=jnp.float32, in_dim=20, motion_guidance=False)
    dit = WanDiT(cfg)
    rs = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rs.randn(1, 2, 8, 8, 16), jnp.float32),
        "y": jnp.asarray(rs.randn(1, 2, 8, 8, 4), jnp.float32),
        "context": jnp.asarray(rs.randn(1, cfg.text_len, cfg.text_dim),
                               jnp.float32),
        "clip_fea": jnp.asarray(rs.randn(1, cfg.clip_tokens, cfg.clip_dim),
                                jnp.float32),
    }
    params0 = dit.init(jax.random.PRNGKey(0), batch["latents"],
                       jnp.zeros((1,)), batch["context"], y=batch["y"],
                       clip_fea=batch["clip_fea"])
    leaves, td = jax.tree_util.tree_flatten(params0)
    params0 = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rs.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    tx = optax.adamw(1e-4)
    tcfg = StraagTrainConfig(world_size=1, use_ema=False)
    rng = jax.random.PRNGKey(5)

    fused = make_train_step(dit, tx, tcfg)
    p_a, o_a, _, m_a = fused(params0, tx.init(params0), None, batch, rng,
                             10)

    grad_fn, update_fn = make_split_train_step(dit, tx, tcfg)
    loss, grads = grad_fn(params0, batch, rng, 10)
    assert not should_skip_update(float(loss), 10, tcfg)
    p_b, o_b, ema_b, m_b = update_fn(params0, tx.init(params0), None,
                                     grads, 10)
    assert ema_b is None

    np.testing.assert_allclose(float(m_a["loss"]), float(loss), rtol=1e-6)
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)

    # host-side skip rule == the fused step's in-graph where-select rule
    assert should_skip_update(float("nan"), 0, tcfg)
    big = tcfg.abnormal_loss_threshold * 2
    assert should_skip_update(big, (tcfg.abnormal_loss_start_step + 1)
                              * max(tcfg.grad_accum_steps, 1), tcfg)
    assert not should_skip_update(big, 0, tcfg)  # before the start step

    # EMA + trainable_filter parity (the harness's full split mode)
    tcfg_e = StraagTrainConfig(world_size=1, use_ema=True, ema_decay=0.9)
    filt = lambda path: "blocks" in path  # noqa: E731
    fused_e = make_train_step(dit, tx, tcfg_e, trainable_filter=filt)
    p_a2, o_a2, ema_a2, m_a2 = fused_e(
        params0, tx.init(params0),
        jax.tree_util.tree_map(jnp.copy, params0), batch, rng, 10)
    g2, u2 = make_split_train_step(dit, tx, tcfg_e, trainable_filter=filt)
    loss2, grads2 = g2(params0, batch, rng, 10)
    p_b2, o_b2, ema_b2, _ = u2(params0, tx.init(params0),
                               jax.tree_util.tree_map(jnp.copy, params0),
                               grads2, 10)
    np.testing.assert_allclose(float(m_a2["loss"]), float(loss2),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves((p_a2, ema_a2)),
                    jax.tree_util.tree_leaves((p_b2, ema_b2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)


def test_full_ref_conditioning_reaches_gradients():
    """--add_full_ref_image_in_self_attention (train_wan.py:1816-1836,
    :1948): with a ref_conv-enabled DiT, the training step consumes
    batch['full_ref'] and gradients flow into the ref_conv patchifier;
    the ref tokens also change the loss (non-no-op when the model has
    the path — the reference's own shipped config leaves add_ref_conv
    off, making the flag dead there)."""
    import optax

    from more4d_tpu.config import dit_tiny
    from more4d_tpu.models import WanDiT
    from more4d_tpu.train.train_straag import (StraagTrainConfig,
                                               make_train_step)

    cfg = dit_tiny(dtype=jnp.float32, in_dim=20, motion_guidance=False,
                   ref_conv=True, ref_conv_dim=16)
    dit = WanDiT(cfg)
    rs = np.random.RandomState(1)
    full_ref = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)
    batch = {
        "latents": jnp.asarray(rs.randn(1, 2, 8, 8, 16), jnp.float32),
        "y": jnp.asarray(rs.randn(1, 2, 8, 8, 4), jnp.float32),
        "context": jnp.asarray(rs.randn(1, cfg.text_len, cfg.text_dim),
                               jnp.float32),
        "clip_fea": jnp.asarray(rs.randn(1, cfg.clip_tokens, cfg.clip_dim),
                                jnp.float32),
        "full_ref": full_ref,
    }
    params = dit.init(jax.random.PRNGKey(0), batch["latents"],
                      jnp.zeros((1,)), batch["context"], y=batch["y"],
                      clip_fea=batch["clip_fea"], full_ref=full_ref)
    leaves, td = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rs.normal(0, 0.04, l.shape), l.dtype)
             for l in leaves])
    tx = optax.adamw(1e-4)
    tcfg = StraagTrainConfig(world_size=1, use_ema=False)
    step = make_train_step(dit, tx, tcfg)
    rng = jax.random.PRNGKey(2)

    p1, _, _, m1 = step(params, tx.init(params), None, batch, rng, 10)
    # grads reached the ref patchifier: its params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["params"]["ref_conv_layer"],
        p1["params"]["ref_conv_layer"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # and the ref tokens affect the loss (same rng, different full_ref)
    batch2 = dict(batch, full_ref=full_ref * 0.0)
    _, _, _, m2 = step(params, tx.init(params), None, batch2, rng, 10)
    assert float(m1["loss"]) != float(m2["loss"])

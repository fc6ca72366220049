"""End-to-end tiny pipeline runs: control + inpaint, TeaCache, cfg-skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from more4d_tpu.config import (DiTConfig, PipelineConfig, VAEConfig,
                               dit_tiny, vae_tiny)
from more4d_tpu.models import WanDiT
from more4d_tpu.models.wan_vae import WanVAE
from more4d_tpu.pipelines import (TeaCacheConfig, WanControlPipeline,
                                  WanInpaintPipeline)

H, W, T = 32, 32, 9


def _vae():
    cfg = VAEConfig(dim=4, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                    temporal_downsample=(False, True, True))
    model = WanVAE(cfg)
    x = jnp.zeros((1, T, H, W, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def _dit(in_dim, motion=False):
    cfg = dit_tiny(dtype=jnp.float32, in_dim=in_dim, out_dim=4,
                   motion_guidance=motion, dim=32, ffn_dim=64, num_heads=2,
                   num_layers=2, text_dim=16, clip_dim=16, text_len=12)
    model = WanDiT(cfg)
    return model, cfg


def _init_dit(model, cfg, latents, y_ch, motion=False):
    rng = np.random.RandomState(0)
    b, tl, h, w, z = latents.shape
    y = jnp.zeros((b, tl, h, w, y_ch), jnp.float32)
    t = jnp.zeros((b,), jnp.float32)
    ctx = jnp.zeros((b, cfg.text_len, cfg.text_dim), jnp.float32)
    clip = jnp.zeros((b, cfg.clip_tokens, cfg.clip_dim), jnp.float32)
    kw = dict(clip_fea=clip)
    if motion:
        kw["mpm_features"] = jnp.zeros((b, 196, cfg.motion_feature_dim),
                                       jnp.float32)
    params = model.init(jax.random.PRNGKey(1), latents, t, ctx, y=y, **kw)
    leaves, td = jax.tree_util.tree_flatten(params)
    leaves = [jnp.asarray(rng.normal(0, 0.04, l.shape), l.dtype)
              for l in leaves]
    return jax.tree_util.tree_unflatten(td, leaves)


@pytest.mark.parametrize("scheduler", ["flow", "flow_unipc", "flow_dpm++"])
def test_control_pipeline_end_to_end(scheduler):
    vae, vae_params = _vae()
    # cond: control(4) + start(4) + depth(4) = 12; noise 4 -> in_dim 16
    dit, dcfg = _dit(in_dim=16, motion=True)
    pipe = WanControlPipeline(
        dit, vae, PipelineConfig(num_inference_steps=4, guidance_scale=5.0,
                                 shift=3.0, scheduler=scheduler,
                                 num_frames=T, height=H, width=W))
    rng = np.random.RandomState(2)
    prompt = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    neg = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    control = jnp.asarray(rng.rand(1, T, H, W, 3) * 2 - 1, jnp.float32)
    start = jnp.asarray(rng.rand(1, 1, H, W, 3) * 2 - 1, jnp.float32)
    depth = jnp.asarray(rng.rand(1, 1, H, W, 3) * 2 - 1, jnp.float32)
    clip = jnp.asarray(rng.randn(1, dcfg.clip_tokens, dcfg.clip_dim),
                       jnp.float32)
    mpm = jnp.asarray(rng.randn(1, 196, dcfg.motion_feature_dim), jnp.float32)

    latents = pipe.prepare_latents(jax.random.PRNGKey(3), 1)
    dit_params = _init_dit(dit, dcfg, latents, 12, motion=True)

    out = pipe(dit_params, vae_params, jax.random.PRNGKey(3), prompt,
               neg_embeds=neg, control_video=control, start_image=start,
               depth_image=depth, clip_fea=clip, mpm_features=mpm,
               output_type="no_normalize")
    assert out.shape == (1, T, H, W, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_prepare_conditions_batched_encode_matches_serial():
    """The batch-2 stacked control+depth encode must be bit-identical to
    two serial encode_video calls (per-sample convs + GroupNorm)."""
    vae, vae_params = _vae()
    dit, dcfg = _dit(in_dim=16, motion=False)
    pipe = WanControlPipeline(
        dit, vae, PipelineConfig(num_inference_steps=2, num_frames=T,
                                 height=H, width=W))
    rng = np.random.RandomState(3)
    control = jnp.asarray(rng.rand(1, T, H, W, 3) * 2 - 1, jnp.float32)
    depth = jnp.asarray(rng.rand(1, 1, H, W, 3) * 2 - 1, jnp.float32)
    lat_shape = (1, (T - 1) // 4 + 1, H // 8, W // 8, 4)

    y = pipe.prepare_conditions(vae_params, lat_shape, control,
                                depth_image=depth)
    ctrl_lat = pipe.encode_video(vae_params, control, static_hint=True)
    depth_video = jnp.broadcast_to(depth, (1, T) + depth.shape[2:])
    depth_lat = pipe.encode_video(vae_params, depth_video, static_hint=True)
    np.testing.assert_array_equal(np.asarray(y[..., :4]),
                                  np.asarray(ctrl_lat))
    np.testing.assert_array_equal(np.asarray(y[..., 8:]),
                                  np.asarray(depth_lat))


def test_teacache_threshold_zero_is_exact():
    """rel_l1_thresh=0 -> accumulated distance always >= thresh -> every step
    computes the blocks; result must equal the no-teacache pipeline."""
    vae, vae_params = _vae()
    dit, dcfg = _dit(in_dim=12)
    pcfg = PipelineConfig(num_inference_steps=4, guidance_scale=5.0,
                          num_frames=T, height=H, width=W)
    rng = np.random.RandomState(4)
    prompt = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    neg = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)

    pipe_a = WanControlPipeline(dit, vae, pcfg)
    pipe_b = WanControlPipeline(dit, vae, pcfg, teacache=TeaCacheConfig(
        coefficients=(0.0, 0.0, 0.0, 1.0, 0.0), rel_l1_thresh=0.0,
        num_skip_start_steps=0))

    latents = pipe_a.prepare_latents(jax.random.PRNGKey(5), 1)
    dit_params = _init_dit(dit, dcfg, latents, 8)
    y = pipe_a.prepare_conditions(vae_params, latents.shape)

    out_a = pipe_a.denoise(dit_params, latents, prompt, neg, y=y)
    out_b = pipe_b.denoise(dit_params, latents, prompt, neg, y=y)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)


def test_teacache_huge_threshold_skips():
    """A huge threshold after warmup makes later steps replay the residual —
    output differs from exact but stays finite."""
    vae, vae_params = _vae()
    dit, dcfg = _dit(in_dim=12)
    pcfg = PipelineConfig(num_inference_steps=6, guidance_scale=5.0,
                          num_frames=T, height=H, width=W)
    rng = np.random.RandomState(6)
    prompt = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    neg = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)

    pipe_exact = WanControlPipeline(dit, vae, pcfg)
    pipe_skip = WanControlPipeline(dit, vae, pcfg, teacache=TeaCacheConfig(
        coefficients=(0.0, 0.0, 0.0, 0.0, 0.0), rel_l1_thresh=1e9,
        num_skip_start_steps=2))

    latents = pipe_exact.prepare_latents(jax.random.PRNGKey(7), 1)
    dit_params = _init_dit(dit, dcfg, latents, 8)
    y = pipe_exact.prepare_conditions(vae_params, latents.shape)

    out_a = pipe_exact.denoise(dit_params, latents, prompt, neg, y=y)
    out_b = pipe_skip.denoise(dit_params, latents, prompt, neg, y=y)
    assert np.isfinite(np.asarray(out_b)).all()
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 0


def test_cfg_skip_phases():
    vae, vae_params = _vae()
    dit, dcfg = _dit(in_dim=12)
    pcfg = PipelineConfig(num_inference_steps=6, guidance_scale=5.0,
                          cfg_skip_ratio=0.34, num_frames=T, height=H,
                          width=W)
    pipe = WanControlPipeline(dit, vae, pcfg)
    rng = np.random.RandomState(8)
    prompt = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    neg = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    latents = pipe.prepare_latents(jax.random.PRNGKey(9), 1)
    dit_params = _init_dit(dit, dcfg, latents, 8)
    y = pipe.prepare_conditions(vae_params, latents.shape)
    out = pipe.denoise(dit_params, latents, prompt, neg, y=y)
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_pipeline_end_to_end():
    vae, vae_params = _vae()
    dit, dcfg = _dit(in_dim=12)  # 4 noise + 4 mask + 4 masked-video
    pipe = WanInpaintPipeline(
        dit, vae, PipelineConfig(num_inference_steps=3, guidance_scale=5.0,
                                 num_frames=T, height=H, width=W))
    rng = np.random.RandomState(10)
    prompt = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    neg = jnp.asarray(rng.randn(1, 12, dcfg.text_dim), jnp.float32)
    video = jnp.asarray(rng.rand(1, T, H, W, 3) * 2 - 1, jnp.float32)
    mask = jnp.asarray((rng.rand(1, T, H, W, 1) > 0.7), jnp.float32)

    latents = pipe.prepare_latents(jax.random.PRNGKey(11), 1)
    dit_params = _init_dit(dit, dcfg, latents, 8)
    out = pipe(dit_params, vae_params, jax.random.PRNGKey(11), prompt,
               neg_embeds=neg, video=video, mask=mask)
    assert out.shape == (1, T, H, W, 3)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1


def test_mask_folding_shapes():
    from more4d_tpu.pipelines.inpaint import (fold_mask_to_latent_channels,
                                              resize_mask_to_latent)
    mask = jnp.ones((2, 9, 16, 16, 1))
    m4 = fold_mask_to_latent_channels(mask)
    assert m4.shape == (2, 3, 16, 16, 4)
    lat = resize_mask_to_latent(m4, (2, 3, 4, 4, 16))
    assert lat.shape == (2, 3, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(lat), 1.0, rtol=1e-6)


def test_solver_knobs_reach_pipeline():
    """PipelineConfig.scheduler_kwargs forwards the solver-constructor
    knobs (fm_solvers.py:81-140 surface) into the denoise loop's
    scheduler."""
    from more4d_tpu.diffusion import FlowDPMScheduler, FlowUniPCScheduler

    dit, _cfg = _dit(36)
    vae, _vp = _vae()
    pcfg = PipelineConfig(num_inference_steps=4, scheduler="flow_dpm++",
                          scheduler_kwargs=(("solver_order", 3),
                                            ("solver_type", "heun")),
                          num_frames=9, height=32, width=32)
    pipe = WanControlPipeline(dit, vae, pcfg)
    assert isinstance(pipe.scheduler, FlowDPMScheduler)
    assert pipe.scheduler.solver_order == 3
    assert pipe.scheduler.solver_type == "heun"

    pcfg2 = PipelineConfig(num_inference_steps=4, scheduler="flow_unipc",
                           scheduler_kwargs=(("solver_order", 3),
                                             ("solver_type", "bh1")),
                           num_frames=9, height=32, width=32)
    pipe2 = WanControlPipeline(dit, vae, pcfg2)
    assert isinstance(pipe2.scheduler, FlowUniPCScheduler)
    assert pipe2.scheduler.solver_order == 3


def test_teacache_residual_offload_identical():
    """offload_residual parks the cached residual in pinned host memory
    between steps (the reference TeaCache offload=True,
    cache_utils.py:44-74) — a pure memory-placement change: the denoise
    trajectory must be bitwise-identical to the resident variant."""
    dit, cfg = _dit(24, motion=False)
    vae, _ = _vae()
    pcfg = PipelineConfig(num_inference_steps=8, guidance_scale=5.0,
                          num_frames=T, height=H, width=W,
                          cfg_skip_ratio=0.25)
    probe = WanControlPipeline(dit, vae, pcfg)
    latents = probe.prepare_latents(jax.random.PRNGKey(3), 1)
    params = _init_dit(dit, cfg, latents, 20)
    prompt = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    y = jnp.zeros(latents.shape[:-1] + (20,), jnp.float32)
    clip = jnp.zeros((1, cfg.clip_tokens, cfg.clip_dim), jnp.float32)

    outs = []
    for offload in (False, True):
        tc = TeaCacheConfig(coefficients=(0.0, 0.0, 0.0, 1.0, 0.0),
                            rel_l1_thresh=0.5, num_skip_start_steps=2,
                            offload_residual=offload)
        pipe = WanControlPipeline(dit, vae, pcfg, teacache=tc)
        outs.append(np.asarray(pipe.denoise(
            params, latents, prompt, neg_embeds=prompt, y=y,
            clip_fea=clip)))
    np.testing.assert_array_equal(outs[0], outs[1])

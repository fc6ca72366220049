"""Full two-stage integration test with tiny models: image -> depth ->
trajectories -> renders -> inpainted novel-view videos."""

import jax
import jax.numpy as jnp
import numpy as np

from more4d_tpu.config import PipelineConfig, VAEConfig, dit_tiny
from more4d_tpu.infer import TwoStageModels, run_two_stage
from more4d_tpu.models import WanDiT
from more4d_tpu.models.adaptors import VAEDecoderAdaptor
from more4d_tpu.models.wan_vae import WanVAE
from more4d_tpu.pipelines import WanControlPipeline, WanInpaintPipeline

H = W = 32
T = 5


def _randomized(params, seed):
    leaves, td = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_unflatten(
        td, [jnp.asarray(rng.normal(0, 0.03, l.shape), l.dtype)
             for l in leaves])


def test_batched_render_matches_serial():
    """render_trajectories(batched=True) — the one-dispatch 11-sweep — must
    produce exactly what the serial per-trajectory loop produces."""
    from more4d_tpu.infer.two_stage import render_trajectories

    rs = np.random.RandomState(3)
    coords = (rs.rand(T, 96, 3).astype(np.float32) + [[0.0, 0.0, 2.0]])
    colors = rs.rand(96, 3).astype(np.float32)
    tt = [("static", {}), ("circle_rotating", {}),
          ("forward_backward", {})]
    batched = render_trajectories(coords, colors, H, W, tt, batched=True)
    serial = render_trajectories(coords, colors, H, W, tt, batched=False)
    assert [r["name"] for r in batched] == [r["name"] for r in serial]
    for b, s in zip(batched, serial):
        np.testing.assert_array_equal(b["frames"], s["frames"])
        np.testing.assert_array_equal(b["mask"], s["mask"])


def test_render_trajectories_center_is_frame0(monkeypatch):
    """The sweep center comes from the FIRST frame's cloud only (the
    reference dispatcher: coords_data[0].mean, infer.py render_trajectory)
    — the depth-proportional radii scale off center[2], so an all-frame
    mean would drift the camera amplitude on dynamic scenes."""
    import more4d_tpu.infer.two_stage as ts

    rs = np.random.RandomState(0)
    coords = rs.rand(3, 64, 3).astype(np.float32)
    coords[0, :, 2] = 2.0     # frame-0 depth ~2
    coords[1:, :, 2] = 200.0  # later frames drift far away
    colors = rs.rand(64, 3).astype(np.float32)

    seen = {}
    real = ts.generate_trajectory

    def spy(name, center, n, **kw):
        seen["center"] = np.asarray(center)
        return real(name, center, n, **kw)

    monkeypatch.setattr(ts, "generate_trajectory", spy)
    ts.render_trajectories(coords, colors, H, W, [("static", {})],
                           batched=False)
    np.testing.assert_allclose(seen["center"],
                               coords[0].mean(axis=0), rtol=1e-6)


def test_two_stage_end_to_end():
    vcfg = VAEConfig(dim=4, z_dim=4, dim_mult=(1, 1, 2, 2),
                     num_res_blocks=1,
                     temporal_downsample=(False, True, True))
    vae = WanVAE(vcfg)
    vae_params = vae.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, T, H, W, 3)))

    text_dim = 16
    dcfg4 = dit_tiny(dtype=jnp.float32, in_dim=16, out_dim=4, dim=32,
                     ffn_dim=64, num_heads=2, num_layers=2,
                     text_dim=text_dim, clip_dim=16, text_len=8,
                     motion_guidance=False, model_type="t2v")
    dcfg_inp = dit_tiny(dtype=jnp.float32, in_dim=12, out_dim=4, dim=32,
                        ffn_dim=64, num_heads=2, num_layers=2,
                        text_dim=text_dim, clip_dim=16, text_len=8,
                        model_type="t2v")
    dit4 = WanDiT(dcfg4)
    dit_inp = WanDiT(dcfg_inp)

    pcfg = PipelineConfig(num_inference_steps=2, guidance_scale=5.0,
                          num_frames=T, height=H, width=W)
    ctrl = WanControlPipeline(dit4, vae, pcfg)
    inp = WanInpaintPipeline(dit_inp, vae, pcfg)

    lat = ctrl.prepare_latents(jax.random.PRNGKey(1), 1)
    b, tl, lh, lw, z = lat.shape
    p4 = dit4.init(jax.random.PRNGKey(2), lat,
                   jnp.zeros((1,)), jnp.zeros((1, 8, text_dim)),
                   y=jnp.zeros((1, tl, lh, lw, 12)))
    p_inp = dit_inp.init(jax.random.PRNGKey(3), lat,
                         jnp.zeros((1,)), jnp.zeros((1, 8, text_dim)),
                         y=jnp.zeros((1, tl, lh, lw, 8)))
    p4, p_inp = _randomized(p4, 4), _randomized(p_inp, 5)

    dec = VAEDecoderAdaptor(ch=8)
    dec_p = dec.init(jax.random.PRNGKey(6), jnp.zeros((1, T, H, W, 3)))

    rngs = np.random.RandomState(7)

    def encode_text(prompts):
        return jnp.asarray(rngs.randn(len(prompts), 8, text_dim),
                           jnp.float32)

    models = TwoStageModels(
        control_pipeline=ctrl, inpaint_pipeline=inp,
        dit4d_params=p4, dit_inp_params=p_inp, vae_params=vae_params,
        decoder_adaptor=dec, decoder_adaptor_params=dec_p,
        encode_text=encode_text,
        estimate_depth=lambda img: np.full(img.shape[:2], 2.0, np.float32))

    image = rngs.rand(H, W, 3).astype(np.float32)
    out = run_two_stage(models, image, "a cat",
                        trajectory_types=[("static", {}),
                                          ("circle_rotating", {})],
                        use_gs=True)

    assert out["coords"].shape == (T, H * W, 3)
    # frame 0 is the exact back-projected cloud: depth 2 everywhere
    np.testing.assert_allclose(out["coords"][0, :, 2], 2.0, rtol=1e-4)
    assert len(out["videos"]) == 2
    for v in out["videos"]:
        assert v["video"].shape == (T, H, W, 3)
        assert np.isfinite(v["video"]).all()
        assert v["video"].min() >= 0 and v["video"].max() <= 1
    # static trajectory from the identity camera must cover most pixels
    static_mask = out["renders"][0]["mask"]
    assert static_mask[0].mean() < 0.5

    # grouped denoise (batched encode + narrow denoise loops) must match
    # the one-batch loop: the DiT is per-sample and the TeaCache decision
    # statistic depends only on t
    import dataclasses as _dc

    from more4d_tpu.infer.two_stage import stage2_inpaint_batch
    det = _dc.replace(models, encode_text=lambda prompts: jnp.full(
        (len(prompts), 8, text_dim), 0.1, jnp.float32))
    whole = stage2_inpaint_batch(det, out["renders"], "a cat",
                                 rng=jax.random.PRNGKey(9))
    grouped = stage2_inpaint_batch(det, out["renders"], "a cat",
                                   rng=jax.random.PRNGKey(9),
                                   denoise_group=1)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(grouped),
                               atol=2e-5)

    # data-parallel trajectory sweep (stage2_inpaint_dp): one trajectory
    # per device over the virtual 8-device mesh, k=2 padded to 8 — must
    # reproduce the serial sweep exactly (same rng -> same noise rows)
    from more4d_tpu.infer.two_stage import stage2_inpaint_dp
    dp = stage2_inpaint_dp(det, out["renders"], "a cat",
                           rng=jax.random.PRNGKey(9))
    assert dp.shape == np.asarray(whole).shape
    np.testing.assert_allclose(dp, np.asarray(whole), atol=2e-4)

    # a stale globally-installed Ulysses seq mesh (e.g. left by a stage-1
    # --sp run) must be cleared for the sweep's duration — same result,
    # zero cross-chip attention — and restored afterwards
    from more4d_tpu.parallel import (MeshConfig, create_mesh, get_mesh,
                                     set_mesh)
    stale = create_mesh(MeshConfig(data=1, fsdp=1, seq=2),
                        jax.devices()[:2])
    set_mesh(stale)
    import more4d_tpu.parallel.ulysses as _ulysses

    def _must_not_route(*a, **k):
        raise AssertionError("ulysses_attention invoked inside the "
                             "pure-DP sweep — stale seq mesh not cleared")

    real_ulysses = _ulysses.ulysses_attention
    _ulysses.ulysses_attention = _must_not_route
    # the earlier dp call traced these shapes with no mesh installed;
    # force a retrace so the seq_parallel_size() branch is re-evaluated
    # under the stale mesh (jit cache keys don't include the global mesh)
    jax.clear_caches()
    try:
        dp_stale = stage2_inpaint_dp(det, out["renders"], "a cat",
                                     rng=jax.random.PRNGKey(9))
        assert get_mesh() is stale  # restored after the sweep
    finally:
        _ulysses.ulysses_attention = real_ulysses
        set_mesh(None)
    np.testing.assert_allclose(dp_stale, dp, atol=1e-5)

    # shared_noise = the reference's per-trajectory re-seed semantics
    # (infer.py:957-959): every trajectory denoises from the SAME initial
    # noise, so two IDENTICAL renders must yield identical videos — and
    # the DP path must agree with the batch path row-for-row
    dup = [out["renders"][0], out["renders"][0]]
    sn = stage2_inpaint_batch(det, dup, "a cat",
                              rng=jax.random.PRNGKey(9), shared_noise=True)
    np.testing.assert_allclose(np.asarray(sn[0]), np.asarray(sn[1]),
                               atol=1e-5)
    sn_dp = stage2_inpaint_dp(det, dup, "a cat",
                              rng=jax.random.PRNGKey(9), shared_noise=True)
    np.testing.assert_allclose(sn_dp, np.asarray(sn), atol=2e-4)

    # run_two_stage(sweep_mesh=...) == run_two_stage(stage2_batch=k):
    # the DP branch folds the same chunk rng as the serial whole-batch
    # path, so toggling the branch cannot change the videos
    serial = run_two_stage(det, image, "a cat",
                           trajectory_types=[("static", {}),
                                             ("circle_rotating", {})],
                           use_gs=True, stage2_batch=2)
    from jax.sharding import Mesh
    swept = run_two_stage(det, image, "a cat",
                          trajectory_types=[("static", {}),
                                            ("circle_rotating", {})],
                          use_gs=True,
                          sweep_mesh=Mesh(np.asarray(jax.devices()),
                                          ("data",)))
    assert [v["name"] for v in swept["videos"]] == \
           [v["name"] for v in serial["videos"]]
    for vs, vw in zip(serial["videos"], swept["videos"]):
        np.testing.assert_allclose(vw["video"], vs["video"], atol=2e-4)

"""WanDiT structural and numerical tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from more4d_tpu.config import dit_tiny
from more4d_tpu.models import WanDiT


def _randomize(params, seed=0):
    """Replace every leaf with small random values (the output head is
    zero-init, so freshly-initialised models output exactly zero — numeric
    comparisons need non-trivial weights)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    new = [jnp.asarray(rng.normal(0, 0.05, l.shape), l.dtype) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, new)


def _inputs(rng, cfg, b=1, t=5, h=8, w=8, text_len=7):
    noise_ch = 16
    cond_ch = cfg.in_dim - noise_ch
    x = jnp.asarray(rng.randn(b, t, h, w, noise_ch), jnp.float32)
    y = jnp.asarray(rng.randn(b, t, h, w, cond_ch), jnp.float32)
    ts = jnp.asarray(rng.uniform(0, 1000, (b,)), jnp.float32)
    ctx = jnp.asarray(rng.randn(b, text_len, cfg.text_dim), jnp.float32)
    clip = jnp.asarray(rng.randn(b, cfg.clip_tokens, cfg.clip_dim),
                       jnp.float32)
    return x, y, ts, ctx, clip


def test_forward_shapes_i2v():
    cfg = dit_tiny(dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x, y, ts, ctx, clip = _inputs(rng, cfg)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, y=y,
                        clip_fea=clip)
    out = model.apply(params, x, ts, ctx, y=y, clip_fea=clip)
    assert out.shape == (1, 5, 8, 8, cfg.out_dim)
    # zero-init output head -> exactly zero at init (wan init_weights :1390)
    assert np.abs(np.asarray(out)).max() == 0.0


def test_t2v_has_no_img_branch():
    cfg = dit_tiny(model_type="t2v", dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x, y, ts, ctx, _ = _inputs(rng, cfg)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, y=y)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = "/".join(str(p) for p, _ in flat)
    assert "k_img" not in names
    out = model.apply(params, x, ts, ctx, y=y)
    assert out.shape == (1, 5, 8, 8, cfg.out_dim)


def test_scan_matches_loop():
    cfg_scan = dit_tiny(dtype=jnp.float32, num_layers=3)
    cfg_loop = dit_tiny(dtype=jnp.float32, num_layers=3, scan_blocks=False)
    rng = np.random.RandomState(2)
    x, y, ts, ctx, clip = _inputs(rng, cfg_scan)

    loop_model = WanDiT(cfg_loop)
    params_loop = loop_model.init(jax.random.PRNGKey(7), x, ts, ctx, y=y,
                                  clip_fea=clip)
    params_loop = _randomize(params_loop, seed=11)

    # restack per-layer params into the scanned layout
    p = params_loop["params"]
    blocks = [p[f"blocks_{i}"] for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    params_scan = {"params": {
        **{k: v for k, v in p.items() if not k.startswith("blocks_")},
        "blocks": {"block": stacked},
    }}

    out_loop = loop_model.apply(params_loop, x, ts, ctx, y=y, clip_fea=clip)
    scan_model = WanDiT(cfg_scan)
    out_scan = scan_model.apply(params_scan, x, ts, ctx, y=y, clip_fea=clip)
    np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                               rtol=1e-5, atol=1e-5)


def test_motion_guidance_film_identity_at_init():
    cfg = dit_tiny(dtype=jnp.float32, motion_guidance=True)
    rng = np.random.RandomState(3)
    x, y, ts, ctx, clip = _inputs(rng, cfg)
    mpm = jnp.asarray(rng.randn(1, 196, cfg.motion_feature_dim), jnp.float32)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, y=y,
                        clip_fea=clip, mpm_features=mpm)
    init_film = {
        k: params["params"]["blocks"]["block"][k]
        for k in ("spatial_guidance_self", "spatial_guidance_ffn")
    }
    params = _randomize(params, seed=13)
    params["params"]["blocks"]["block"].update(init_film)  # keep FiLM at init
    out_a = model.apply(params, x, ts, ctx, y=y, clip_fea=clip,
                        mpm_features=mpm)
    out_b = model.apply(params, x, ts, ctx, y=y, clip_fea=clip,
                        mpm_features=mpm * 0)
    # zero-init FiLM gate -> MPM features must not affect the output at init
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)

    # ...but do affect it once the gate is non-zero
    def bump_gates(t):
        return jax.tree_util.tree_map(lambda a: a + 0.5, t)

    p2 = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy
    import flax
    p2 = flax.core.unfreeze(p2) if hasattr(flax.core, "unfreeze") else p2
    blk = p2["params"]["blocks"]["block"]
    blk["spatial_guidance_self"]["gate"] = (
        blk["spatial_guidance_self"]["gate"] + 0.5)
    blk["spatial_guidance_self"]["spatial_guide"]["kernel"] = (
        blk["spatial_guidance_self"]["spatial_guide"]["kernel"] + 0.1)
    # the output head is zero-init; un-zero it so effects are observable
    p2["params"]["head"]["head"]["kernel"] = (
        p2["params"]["head"]["head"]["kernel"] + 0.01)
    out_c = model.apply(p2, x, ts, ctx, y=y, clip_fea=clip, mpm_features=mpm)
    out_d = model.apply(p2, x, ts, ctx, y=y, clip_fea=clip,
                        mpm_features=mpm * 0)
    assert np.abs(np.asarray(out_c) - np.asarray(out_d)).max() > 0


def test_per_token_timesteps_and_padding():
    cfg = dit_tiny(dtype=jnp.float32)
    rng = np.random.RandomState(4)
    x, y, ts, ctx, clip = _inputs(rng, cfg)
    f, h, w = 5, 4, 4
    seq_len = f * h * w + 8  # pad 8 tokens
    t_tok = jnp.broadcast_to(ts[:, None], (1, seq_len))
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, y=y,
                        clip_fea=clip)
    params = _randomize(params, seed=12)
    out_scalar = model.apply(params, x, ts, ctx, y=y, clip_fea=clip,
                             seq_len=seq_len)
    out_tok = model.apply(params, x, t_tok, ctx, y=y, clip_fea=clip,
                          seq_len=seq_len)
    # constant per-token timesteps == scalar timestep
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_tok),
                               rtol=1e-4, atol=1e-4)
    # padded tokens must not change the result (kv mask)
    out_nopad = model.apply(params, x, ts, ctx, y=y, clip_fea=clip)
    np.testing.assert_allclose(np.asarray(out_scalar),
                               np.asarray(out_nopad), rtol=1e-4, atol=1e-4)


def test_ref_conv_prepends_frame():
    cfg = dit_tiny(dtype=jnp.float32, ref_conv=True)
    rng = np.random.RandomState(5)
    x, y, ts, ctx, clip = _inputs(rng, cfg)
    ref = jnp.asarray(rng.randn(1, 8, 8, cfg.ref_conv_dim), jnp.float32)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, y=y,
                        clip_fea=clip, full_ref=ref)
    out = model.apply(params, x, ts, ctx, y=y, clip_fea=clip, full_ref=ref)
    assert out.shape == (1, 5, 8, 8, cfg.out_dim)


@pytest.mark.slow
def test_remat_grad_runs():
    cfg = dit_tiny(dtype=jnp.float32, remat=True)
    rng = np.random.RandomState(6)
    x, y, ts, ctx, clip = _inputs(rng, cfg)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx, y=y,
                        clip_fea=clip)

    def loss(p):
        out = model.apply(p, x, ts, ctx, y=y, clip_fea=clip)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_remat_policies_numerically_identical():
    """'nothing'/'dots' remat policies and fraction-p (unscanned) must not
    change values — checkpointing only trades memory for recompute."""
    import numpy as np

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 2, 4, 4, 4), jnp.float32)
    y = jnp.asarray(rs.randn(1, 2, 4, 4, 8), jnp.float32)
    t = jnp.full((1,), 300.0, jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 8, 16), jnp.float32)

    outs = []
    for kw in [dict(remat=False),
               dict(remat=True, remat_policy="nothing"),
               dict(remat=True, remat_policy="dots"),
               dict(remat=True, remat_policy="flash"),
               dict(remat=True, remat_policy="flash_lite"),
               dict(remat=True, remat_policy="flash_ffn"),
               # '_offload' variants: identical values, residuals parked
               # in pinned host memory between fwd and bwd
               dict(remat=True, remat_policy="flash_offload"),
               dict(remat=True, remat_policy="flash_ffn_offload"),
               dict(remat=True, remat_policy="flash",
                    attention_backend="pallas_interpret"),
               dict(remat=True, scan_blocks=False, remat_fraction=0.5),
               dict(remat=False, scan_blocks=False)]:
        cfg = dit_tiny(dtype=jnp.float32, in_dim=12, out_dim=4, dim=32,
                       ffn_dim=64, num_heads=2, num_layers=4, text_dim=16,
                       clip_dim=16, text_len=8, **kw)
        model = WanDiT(cfg)
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, y=y)

        def loss(p):
            return jnp.sum(model.apply(p, x, t, ctx, y=y) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                             for g in jax.tree_util.tree_leaves(grads)))
        outs.append((kw.get("scan_blocks", True), float(val),
                     float(gnorm)))

    # same structure within each blocks layout (scan vs list use different
    # param trees/inits, so compare within groups)
    scan_group = [o for o in outs if o[0]]
    list_group = [o for o in outs if not o[0]]
    for g in (scan_group, list_group):
        vals = [v for _, v, _ in g]
        gs = [gn for _, _, gn in g]
        np.testing.assert_allclose(vals, vals[0], rtol=1e-5)
        np.testing.assert_allclose(gs, gs[0], rtol=1e-4)

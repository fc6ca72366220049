"""Causal VAE: shapes, causality, streaming==full equivalence."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from more4d_tpu.config import VAEConfig, vae_tiny
from more4d_tpu.models.wan_vae import WanVAE
from more4d_tpu.models.vae_streaming import decode_streamed, encode_streamed


def _model(cfg=None, seed=0, t=9, h=16, w=16):
    cfg = cfg or vae_tiny()
    model = WanVAE(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, t, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x)
    # zero-init attention proj means attention is inert; perturb all params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [jnp.asarray(rng.normal(0, 0.08, l.shape), l.dtype)
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, params, x, cfg


@pytest.mark.slow
def test_encode_decode_shapes():
    cfg = VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 4), num_res_blocks=1,
                    temporal_downsample=(False, True))
    model, params, x, _ = _model(cfg, t=9, h=16, w=16)
    mu, lv = model.apply(params, x, method=WanVAE.encode)
    # T: 9 -> 1+(9-1)/2 = 5 (one temporal down); spatial /4
    assert mu.shape == (1, 5, 4, 4, 4)
    assert lv.shape == mu.shape
    out = model.apply(params, mu, method=WanVAE.decode)
    assert out.shape == (1, 9, 16, 16, 3)


@pytest.mark.slow
def test_full_ratio_shapes():
    cfg = VAEConfig(dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                    temporal_downsample=(False, True, True))
    model, params, x, _ = _model(cfg, t=13, h=32, w=32)
    mu, _ = model.apply(params, x, method=WanVAE.encode)
    # the Wan operating point: T=1+4k -> 1+k, spatial /8 (wan_vae.py:754-755)
    assert mu.shape == (1, 4, 4, 4, 4)
    out = model.apply(params, mu, method=WanVAE.decode)
    assert out.shape == (1, 13, 32, 32, 3)


@pytest.mark.slow
def test_encoder_is_causal():
    model, params, x, _ = _model(t=9)
    mu, _ = model.apply(params, x, method=WanVAE.encode)
    # perturb the last 4 input frames: latent frames except the last must
    # be unchanged (latent frame i covers input frames [1+4(i-1), 4i])
    x2 = x.at[:, 5:].set(x[:, 5:] + 3.0)
    mu2, _ = model.apply(params, x2, method=WanVAE.encode)
    np.testing.assert_allclose(np.asarray(mu[:, :2]), np.asarray(mu2[:, :2]),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(mu[:, 2:]) - np.asarray(mu2[:, 2:])).max() > 1e-4


def test_decoder_is_causal():
    model, params, x, _ = _model(t=9)
    mu, _ = model.apply(params, x, method=WanVAE.encode)
    out = model.apply(params, mu, method=WanVAE.decode)
    mu2 = mu.at[:, -1].set(mu[:, -1] + 1.0)
    out2 = model.apply(params, mu2, method=WanVAE.decode)
    # frames produced by earlier latent frames are unchanged
    np.testing.assert_allclose(np.asarray(out[:, :5]),
                               np.asarray(out2[:, :5]), rtol=1e-5, atol=1e-5)


def test_streaming_encode_matches_full():
    model, params, x, _ = _model(t=9)
    mu_f, lv_f = model.apply(params, x, method=WanVAE.encode)
    mu_s, lv_s = encode_streamed(model, params, x)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_f), np.asarray(lv_s),
                               rtol=1e-4, atol=1e-5)


def test_streaming_decode_matches_full():
    model, params, x, _ = _model(t=9)
    mu, _ = model.apply(params, x, method=WanVAE.encode)
    out_f = model.apply(params, mu, method=WanVAE.decode)
    out_s = decode_streamed(model, params, mu)
    assert out_s.shape == out_f.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_streaming_matches_full_wan_pattern():
    # the real downsample pattern [False, True, True] with 2 temporal stages
    cfg = VAEConfig(dim=4, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
                    temporal_downsample=(False, True, True))
    model, params, x, _ = _model(cfg, t=13, h=16, w=16)
    mu_f, _ = model.apply(params, x, method=WanVAE.encode)
    mu_s, _ = encode_streamed(model, params, x)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_s),
                               rtol=1e-4, atol=1e-5)
    out_f = model.apply(params, mu_f, method=WanVAE.decode)
    out_s = decode_streamed(model, params, mu_f)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_static_hint_encode_is_exact():
    """The fixed-point shortcut (encode_streamed static_hint) is bitwise
    exact for a repeated-frame video AND for a video that changes again
    after repeating (the chunk-equality guard must re-enter compute)."""
    import numpy as np

    from more4d_tpu.config import vae_tiny
    from more4d_tpu.models.vae_streaming import encode_streamed
    from more4d_tpu.models.wan_vae import WanVAE

    cfg = vae_tiny(dim_mult=(1, 2, 2), temporal_downsample=(False, True))
    model = WanVAE(cfg)
    rs = np.random.RandomState(0)
    frame = jnp.asarray(rs.rand(1, 1, 16, 16, 3) * 2 - 1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.broadcast_to(frame, (1, 5, 16, 16, 3)))

    # repeated-frame video (long enough for the caches to converge)
    t = 29
    video = jnp.broadcast_to(frame, (1, t, 16, 16, 3))
    ref = encode_streamed(model, params, video)
    fast = encode_streamed(model, params, video, static_hint=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fast[1]))

    # static prefix, then a different tail: the guard must recompute
    tail = jnp.asarray(rs.rand(1, 8, 16, 16, 3) * 2 - 1, jnp.float32)
    video2 = jnp.concatenate([jnp.broadcast_to(frame, (1, 21, 16, 16, 3)),
                              tail], axis=1)
    ref2 = encode_streamed(model, params, video2)
    fast2 = encode_streamed(model, params, video2, static_hint=True)
    np.testing.assert_array_equal(np.asarray(ref2[0]), np.asarray(fast2[0]))


def test_static_hint_with_blocked_chunks():
    """static_hint composes with latents_per_step>1: the fixed-point
    shortcut stays bitwise exact when chunks carry several latent
    frames (the guard compares whole 4g-frame chunks)."""
    import numpy as np

    from more4d_tpu.config import vae_tiny
    from more4d_tpu.models.vae_streaming import encode_streamed
    from more4d_tpu.models.wan_vae import WanVAE

    cfg = vae_tiny(dim_mult=(1, 2, 2), temporal_downsample=(False, True))
    model = WanVAE(cfg)
    rs = np.random.RandomState(1)
    frame = jnp.asarray(rs.rand(1, 1, 16, 16, 3) * 2 - 1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.broadcast_to(frame, (1, 5, 16, 16, 3)))
    video = jnp.broadcast_to(frame, (1, 33, 16, 16, 3))  # k=8 -> g=2: 4 steps
    ref = encode_streamed(model, params, video)
    fast = encode_streamed(model, params, video, static_hint=True,
                           latents_per_step=2)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fast[1]))


@pytest.mark.parametrize("g", [2, 3, 4])
def test_streaming_blocked_chunks_match_full(g):
    """latents_per_step>1 (blocked causal streaming) is numerically
    identical to the fused pass AND to the frame-at-a-time default —
    the conv caches carry exactly the chunk-boundary state either way.
    t=17 -> k=4: g=2 runs TWO multi-latent chunks (cache handoff
    BETWEEN blocked chunks), g=3 exercises the non-divisor fallback
    (->2), g=4 the single-chunk case."""
    model, params, x, _ = _model(t=17)  # k = 4 latent chunks beyond frame 0
    mu_f, lv_f = model.apply(params, x, method=WanVAE.encode)
    mu_s, lv_s = encode_streamed(model, params, x, latents_per_step=g)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_f), np.asarray(lv_s),
                               rtol=1e-4, atol=1e-5)
    out_f = model.apply(params, mu_f, method=WanVAE.decode)
    out_s = decode_streamed(model, params, mu_f, latents_per_step=g)
    assert out_s.shape == out_f.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)

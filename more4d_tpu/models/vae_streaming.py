"""Chunked streaming drivers for the causal VAE — O(1) memory in T.

Mirrors the reference's frame chunking (encode: [1, 4, 4, ...] input frames,
wan_vae.py:520-547; decode: one latent frame at a time, :678-703) as a
``lax.scan`` carrying the functional conv caches. Numerically identical to
the fused full-sequence ``WanVAE.encode``/``decode`` (equivalence-tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .wan_vae import WanVAE


def encode_streamed(model: WanVAE, params, x, normalize: bool = True,
                    static_hint: bool = False, latents_per_step: int = 1):
    """x: [B, T, H, W, 3] with T = 1 + 4k -> (mu, logvar).

    ``latents_per_step``: latent frames produced per scan step (the
    chunk is 4x that many input frames). The causal conv caches carry
    across chunk boundaries, so ANY blocking is numerically identical
    (equivalence-tested); larger chunks trade peak activation memory
    for fewer scan iterations / larger convolutions. Falls back to the
    largest divisor of k when it doesn't divide evenly.

    ``static_hint=True`` enables a fixed-point shortcut for
    repeated-frame videos (4D-STraG conditions on the first frame
    repeated T times, and the depth video is one image broadcast —
    pipeline_wan_fun_control.py:626-655): the causal encoder is a fixed
    map (cache, chunk) -> (cache', latent), so once the conv caches stop
    changing AND the incoming chunk equals the previous one, every later
    chunk's latent is identical and its compute is skipped via lax.cond.
    Exact (the skip triggers only on bitwise cache convergence), safe for
    arbitrary inputs (the chunk-equality guard falls back to computing)."""
    b, t, h, w, c = x.shape
    assert (t - 1) % 4 == 0, f"T must be 1+4k, got {t}"
    k = (t - 1) // 4

    (mu0, lv0), cache = model.apply(
        params, x[:, :1], normalize=normalize, cache=None, return_cache=True,
        method=WanVAE.encode)
    if k == 0:
        return mu0, lv0

    g = max(1, min(latents_per_step, k))
    while k % g:
        g -= 1
    k = k // g
    chunks = x[:, 1:].reshape(b, k, 4 * g, h, w, c)
    chunks = jnp.moveaxis(chunks, 1, 0)          # [k, B, 4g, H, W, C]

    def step(cache, xc):
        (mu, lv), cache = model.apply(
            params, xc, normalize=normalize, cache=cache, return_cache=True,
            method=WanVAE.encode)
        return cache, (mu, lv)

    if static_hint:
        def _tree_same(a, b):
            eqs = [jnp.all(u == v) for u, v in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b))]
            return jnp.all(jnp.stack(eqs))

        lat_shape = jax.eval_shape(lambda c_, xc: step(c_, xc)[1],
                                   cache, chunks[0])

        def step_fp(carry, xc):
            cache, prev_xc, prev_out, done = carry
            eq_in = jnp.all(xc == prev_xc)

            def run(_):
                (mu, lv), c2 = model.apply(
                    params, xc, normalize=normalize, cache=cache,
                    return_cache=True, method=WanVAE.encode)
                converged = jnp.logical_and(_tree_same(cache, c2), eq_in)
                return (c2, xc, (mu, lv), converged), (mu, lv)

            def skip(_):
                return (cache, xc, prev_out, done), prev_out

            # reuse only while the input keeps repeating — a later
            # differing chunk re-enters the compute branch
            return jax.lax.cond(jnp.logical_and(done, eq_in), skip, run,
                                None)

        zero_out = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                lat_shape)
        init = (cache, jnp.zeros_like(chunks[0]), zero_out,
                jnp.asarray(False))
        _, (mus, lvs) = jax.lax.scan(step_fp, init, chunks)
    else:
        _, (mus, lvs) = jax.lax.scan(step, cache, chunks)
    # [k, B, m, h', w', z] -> [B, k*m, h', w', z] (m latent frames per chunk)
    m = mus.shape[2]
    mus = jnp.moveaxis(mus, 0, 1).reshape(b, k * m, *mus.shape[3:])
    lvs = jnp.moveaxis(lvs, 0, 1).reshape(b, k * m, *lvs.shape[3:])
    mu = jnp.concatenate([mu0, mus], axis=1)
    lv = jnp.concatenate([lv0, lvs], axis=1)
    return mu, lv


def decode_streamed(model: WanVAE, params, z, normalize: bool = True,
                    latents_per_step: int = 1):
    """z: [B, T', h', w', z_dim] -> [B, 1 + r*(T'-1), H, W, 3].

    ``latents_per_step``: latent frames decoded per scan step (see
    encode_streamed — blocking is numerically free; larger steps cost
    peak memory, the default 1 is the reference's frame-at-a-time
    pattern, wan_vae.py:678-703)."""
    b, t = z.shape[:2]
    x0, cache = model.apply(params, z[:, :1], normalize=normalize, cache=None,
                            return_cache=True, method=WanVAE.decode)
    if t == 1:
        return x0

    g = max(1, min(latents_per_step, t - 1))
    while (t - 1) % g:
        g -= 1
    frames = jnp.moveaxis(z[:, 1:], 1, 0)          # [T'-1, B, ...]
    frames = frames.reshape((t - 1) // g, g, *frames.shape[1:])
    frames = jnp.moveaxis(frames, 2, 1)            # [(T'-1)/g, B, g, ...]

    def step(cache, zc):
        x, cache = model.apply(params, zc, normalize=normalize, cache=cache,
                               return_cache=True, method=WanVAE.decode)
        return cache, x

    _, xs = jax.lax.scan(step, cache, frames)
    # [steps, B, g*r, H, W, 3] -> [B, (T'-1)*r, H, W, 3]
    xs = jnp.moveaxis(xs, 0, 1)
    xs = xs.reshape(b, xs.shape[1] * xs.shape[2], *xs.shape[3:])
    return jnp.concatenate([x0, xs], axis=1)

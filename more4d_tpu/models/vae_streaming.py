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


def encode_streamed(model: WanVAE, params, x, normalize: bool = True):
    """x: [B, T, H, W, 3] with T = 1 + 4k -> (mu, logvar)."""
    b, t, h, w, c = x.shape
    assert (t - 1) % 4 == 0, f"T must be 1+4k, got {t}"
    k = (t - 1) // 4

    (mu0, lv0), cache = model.apply(
        params, x[:, :1], normalize=normalize, cache=None, return_cache=True,
        method=WanVAE.encode)
    if k == 0:
        return mu0, lv0

    chunks = x[:, 1:].reshape(b, k, 4, h, w, c)
    chunks = jnp.moveaxis(chunks, 1, 0)          # [k, B, 4, H, W, C]

    def step(cache, xc):
        (mu, lv), cache = model.apply(
            params, xc, normalize=normalize, cache=cache, return_cache=True,
            method=WanVAE.encode)
        return cache, (mu, lv)

    _, (mus, lvs) = jax.lax.scan(step, cache, chunks)
    # [k, B, m, h', w', z] -> [B, k*m, h', w', z] (m latent frames per chunk)
    m = mus.shape[2]
    mus = jnp.moveaxis(mus, 0, 1).reshape(b, k * m, *mus.shape[3:])
    lvs = jnp.moveaxis(lvs, 0, 1).reshape(b, k * m, *lvs.shape[3:])
    mu = jnp.concatenate([mu0, mus], axis=1)
    lv = jnp.concatenate([lv0, lvs], axis=1)
    return mu, lv


def decode_streamed(model: WanVAE, params, z, normalize: bool = True):
    """z: [B, T', h', w', z_dim] -> [B, 1 + r*(T'-1), H, W, 3]."""
    b, t = z.shape[:2]
    x0, cache = model.apply(params, z[:, :1], normalize=normalize, cache=None,
                            return_cache=True, method=WanVAE.decode)
    if t == 1:
        return x0

    frames = jnp.moveaxis(z[:, 1:], 1, 0)[:, :, None]  # [T'-1, B, 1, ...]

    def step(cache, zc):
        x, cache = model.apply(params, zc, normalize=normalize, cache=cache,
                               return_cache=True, method=WanVAE.decode)
        return cache, x

    _, xs = jax.lax.scan(step, cache, frames)
    # [T'-1, B, r, H, W, 3] -> [B, (T'-1)*r, H, W, 3]
    r = xs.shape[2]
    xs = jnp.moveaxis(xs, 0, 1).reshape(b, (t - 1) * r, *xs.shape[3:])
    return jnp.concatenate([x0, xs], axis=1)

"""Wan 3D-causal video VAE, TPU-native (channel-last, functional caches).

Re-implements the reference ``AutoencoderKLWan`` (MoRe4D/models/wan_vae.py)
with identical numerics but an XLA-friendly structure. The reference streams
frames through the network in chunks of [1, 4, 4, ...], each CausalConv3d
carrying a mutable 2-frame input cache (CACHE_T=2, wan_vae.py:18-40); the
temporal down/upsample convs carry 1-frame / 2-frame caches with first-chunk
special cases ('Rep' sentinel, :105-164).

Observation used here: that streaming scheme is *exactly* a full-sequence
causal computation —

- stride-1 causal conv  == conv with 2 leading zero frames;
- downsample3d time-conv == ``concat([x[:, :1], conv_valid_stride2(x)])``
  (the first frame bypasses the conv: first-chunk cache bootstrap, :147-163);
- upsample3d time-conv   == frame 0 bypasses; frames 1.. go through a causal
  conv with zero history and 2x channel->time interleave ('Rep', :107-141).

So every module takes ``(x, cache)`` and returns ``(y, new_cache)``:
``cache=None`` gives the single fused full-sequence graph (preferred on TPU);
threading caches through ``lax.scan`` over chunks gives O(1)-in-T streaming
for long videos. Both paths share all weights and are equivalence-tested.

Layout: [B, T, H, W, C].
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import (VAEConfig, WAN_VAE_LATENT_MEAN, WAN_VAE_LATENT_STD)

CACHE_T = 2

Cache = Optional[Dict[str, Any]]


def _get(cache: Cache, name: str):
    if cache is None:
        return None
    return cache.get(name)


class VAERMSNorm(nn.Module):
    """Channel L2-normalise * sqrt(C) * gamma (RMS_norm, wan_vae.py:43-58).

    Note: the reference uses F.normalize (eps=1e-12 on the norm), i.e. RMS
    over channels without the usual mean-square eps.
    """

    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           self.param_dtype)
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        y = xf / jnp.maximum(norm, 1e-12) * (self.dim ** 0.5)
        return (y * gamma.astype(jnp.float32)).astype(x.dtype)


class CausalConv3d(nn.Module):
    """Causal 3D conv: 2*(kt//2) leading zero frames, SAME spatial padding.

    With a cache (last 2 input-stream frames) the leading history comes from
    the stream instead (CausalConv3d, wan_vae.py:21-40).
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        kt, kh, kw = self.kernel
        pt = kt // 2
        conv = nn.Conv(self.features, kernel_size=self.kernel,
                       padding=[(0, 0), (kh // 2, kh // 2),
                                (kw // 2, kw // 2)],
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")
        new_cache = None
        if pt > 0:
            if cache is None:
                b, _, h, w, c = x.shape
                hist = jnp.zeros((b, 2 * pt, h, w, c), x.dtype)
            else:
                hist = cache
            inp = jnp.concatenate([hist, x], axis=1)
            new_cache = inp[:, -CACHE_T:]
        else:
            inp = x
        return conv(inp), new_cache


class ResidualBlock(nn.Module):
    """norm-silu-conv x2 + shortcut (ResidualBlock, wan_vae.py:190-224)."""

    in_dim: int
    out_dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Cache = None):
        kw = dict(param_dtype=self.param_dtype, dtype=self.dtype)
        h = VAERMSNorm(self.in_dim, self.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h, c1 = CausalConv3d(self.out_dim, (3, 3, 3), name="conv1", **kw)(
            h, _get(cache, "conv1"))
        h = VAERMSNorm(self.out_dim, self.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h, c2 = CausalConv3d(self.out_dim, (3, 3, 3), name="conv2", **kw)(
            h, _get(cache, "conv2"))
        if self.in_dim != self.out_dim:
            s, _ = CausalConv3d(self.out_dim, (1, 1, 1), name="shortcut",
                                **kw)(x)
        else:
            s = x
        return h + s, {"conv1": c1, "conv2": c2}


class SpatialAttention(nn.Module):
    """Per-frame single-head self-attention (AttentionBlock, wan_vae.py:227).
    The output projection is zero-initialised."""

    dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        ident = x
        y = VAERMSNorm(self.dim, self.param_dtype, name="norm")(x)
        qkv = nn.Conv(3 * c, (1, 1), dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name="to_qkv")(y.reshape(b * t, h, w, c))
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
        s = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (c ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bij,bjc->bic", p, v).reshape(b * t, h, w, c)
        o = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="proj")(o)
        return ident + o.reshape(b, t, h, w, c)


class SpatialDown(nn.Module):
    """ZeroPad2d((0,1,0,1)) + 3x3 stride-2 conv (Resample 'downsample2d')."""

    dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c)
        y = nn.Conv(self.dim, (3, 3), strides=(2, 2),
                    padding=[(0, 1), (0, 1)], dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(y)
        return y.reshape(b, t, h // 2, w // 2, self.dim)


class SpatialUp(nn.Module):
    """Nearest-exact 2x upsample + 3x3 conv to dim//2 (Resample 'upsample')."""

    dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        y = y.reshape(b * t, 2 * h, 2 * w, c)
        y = nn.Conv(self.dim // 2, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(y)
        return y.reshape(b, t, 2 * h, 2 * w, self.dim // 2)


class TemporalDown(nn.Module):
    """Stride-2 temporal conv; frame 0 bypasses (Resample 'downsample3d',
    wan_vae.py:95-100, 147-163). Cache = last input frame."""

    dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        conv = nn.Conv(self.dim, kernel_size=(3, 1, 1), strides=(2, 1, 1),
                       padding="VALID", dtype=self.dtype,
                       param_dtype=self.param_dtype, name="time_conv")
        if cache is None:
            head = x[:, :1]
            rest = conv(x) if x.shape[1] >= 3 else x[:, :0]
            out = jnp.concatenate([head, rest], axis=1)
        else:
            out = conv(jnp.concatenate([cache, x], axis=1))
        return out, x[:, -1:]


class TemporalUp(nn.Module):
    """2x temporal upsample via 2*dim channels interleaved in time; frame 0
    bypasses entirely (Resample 'upsample3d' + 'Rep' bootstrap,
    wan_vae.py:84-141). Cache = last 2 stream frames (zeros right after the
    bypassed first frame)."""

    dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        conv = nn.Conv(self.dim * 2, kernel_size=(3, 1, 1), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="time_conv")
        b, t, h, w, c = x.shape

        def interleave(y):
            # [B, T, H, W, 2C] -> [B, 2T, H, W, C]; channel group g becomes
            # time offset g (torch reshape(b,2,c,t).stack(dim=3), :138-141)
            tt = y.shape[1]
            y = y.reshape(b, tt, h, w, 2, c)
            y = jnp.moveaxis(y, 4, 2)            # [B, T, 2, H, W, C]
            return y.reshape(b, 2 * tt, h, w, c)

        if cache is None:
            head = x[:, :1]
            stream = x[:, 1:]
            if stream.shape[1] > 0:
                hist = jnp.zeros((b, 2, h, w, c), x.dtype)
                y = conv(jnp.concatenate([hist, stream], axis=1))
                out = jnp.concatenate([head, interleave(y)], axis=1)
                new_cache = jnp.concatenate([hist, stream],
                                            axis=1)[:, -CACHE_T:]
            else:
                out = head
                new_cache = jnp.zeros_like(jnp.concatenate([x, x], axis=1))
        else:
            y = conv(jnp.concatenate([cache, x], axis=1))
            out = interleave(y)
            new_cache = jnp.concatenate([cache, x], axis=1)[:, -CACHE_T:]
        return out, new_cache


class Encoder3d(nn.Module):
    """wan_vae.py:269-370. dims 96*[1,1,2,4,4]; downsample pattern
    [2d, 3d, 3d] for temporal_downsample=[False, True, True]."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, cache: Cache = None):
        cfg = self.cfg
        kw = dict(param_dtype=cfg.param_dtype, dtype=cfg.dtype)
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        caches = {}

        x, caches["conv1"] = CausalConv3d(dims[0], (3, 3, 3), name="conv1",
                                          **kw)(x, _get(cache, "conv1"))

        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(cfg.num_res_blocks):
                name = f"down_{idx}"
                x, caches[name] = ResidualBlock(in_dim, out_dim, name=name,
                                                **kw)(x, _get(cache, name))
                in_dim = out_dim
                idx += 1
            if i != len(cfg.dim_mult) - 1:
                name = f"down_{idx}"
                if cfg.temporal_downsample[i]:
                    x = SpatialDown(out_dim, name=name + "_s", **kw)(x)
                    x, caches[name] = TemporalDown(out_dim, name=name,
                                                   **kw)(x, _get(cache, name))
                else:
                    x = SpatialDown(out_dim, name=name + "_s", **kw)(x)
                idx += 1

        name = "mid_res1"
        x, caches[name] = ResidualBlock(dims[-1], dims[-1], name=name,
                                        **kw)(x, _get(cache, name))
        x = SpatialAttention(dims[-1], name="mid_attn",
                             param_dtype=cfg.param_dtype, dtype=cfg.dtype)(x)
        name = "mid_res2"
        x, caches[name] = ResidualBlock(dims[-1], dims[-1], name=name,
                                        **kw)(x, _get(cache, name))

        x = VAERMSNorm(dims[-1], cfg.param_dtype, name="head_norm")(x)
        x = nn.silu(x)
        x, caches["head_conv"] = CausalConv3d(cfg.z_dim * 2, (3, 3, 3),
                                              name="head_conv", **kw)(
            x, _get(cache, "head_conv"))
        return x, caches


class Decoder3d(nn.Module):
    """wan_vae.py:373-476. Upsample pattern mirrors the encoder."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, cache: Cache = None):
        cfg = self.cfg
        kw = dict(param_dtype=cfg.param_dtype, dtype=cfg.dtype)
        mult = tuple(cfg.dim_mult)
        dims = [cfg.dim * u for u in (mult[-1],) + mult[::-1]]
        temporal_up = tuple(cfg.temporal_downsample)[::-1]
        caches = {}

        x, caches["conv1"] = CausalConv3d(dims[0], (3, 3, 3), name="conv1",
                                          **kw)(x, _get(cache, "conv1"))

        name = "mid_res1"
        x, caches[name] = ResidualBlock(dims[0], dims[0], name=name,
                                        **kw)(x, _get(cache, name))
        x = SpatialAttention(dims[0], name="mid_attn",
                             param_dtype=cfg.param_dtype, dtype=cfg.dtype)(x)
        name = "mid_res2"
        x, caches[name] = ResidualBlock(dims[0], dims[0], name=name,
                                        **kw)(x, _get(cache, name))

        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                in_dim = in_dim // 2  # previous upsample halved channels
            for _ in range(cfg.num_res_blocks + 1):
                name = f"up_{idx}"
                x, caches[name] = ResidualBlock(in_dim, out_dim, name=name,
                                                **kw)(x, _get(cache, name))
                in_dim = out_dim
                idx += 1
            if i != len(mult) - 1:
                name = f"up_{idx}"
                if temporal_up[i]:
                    x, caches[name] = TemporalUp(out_dim, name=name, **kw)(
                        x, _get(cache, name))
                    x = SpatialUp(out_dim, name=name + "_s", **kw)(x)
                else:
                    x = SpatialUp(out_dim, name=name + "_s", **kw)(x)
                idx += 1

        out_dim = dims[-1]
        x = VAERMSNorm(out_dim, cfg.param_dtype, name="head_norm")(x)
        x = nn.silu(x)
        x, caches["head_conv"] = CausalConv3d(3, (3, 3, 3),
                                              name="head_conv", **kw)(
            x, _get(cache, "head_conv"))
        return x, caches


class WanVAE(nn.Module):
    """encode: [B,T,H,W,3] -> (mu, logvar) each [B,T',H/8,W/8,z]; decode back.

    ``encode``/``decode`` are the fused full-sequence graphs; the chunked
    streaming equivalents live in :mod:`more4d_tpu.models.vae_streaming`.
    mu is normalised per channel ((mu - mean)/std, wan_vae.py:539-545) when
    ``normalize=True``.
    """

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder3d(self.cfg, name="encoder")
        self.decoder = Decoder3d(self.cfg, name="decoder")
        self.conv1 = CausalConv3d(self.cfg.z_dim * 2, (1, 1, 1),
                                  param_dtype=self.cfg.param_dtype,
                                  dtype=self.cfg.dtype, name="conv1")
        self.conv2 = CausalConv3d(self.cfg.z_dim, (1, 1, 1),
                                  param_dtype=self.cfg.param_dtype,
                                  dtype=self.cfg.dtype, name="conv2")

    def _latent_stats(self):
        if self.cfg.z_dim == len(WAN_VAE_LATENT_MEAN):
            mean = jnp.asarray(WAN_VAE_LATENT_MEAN, jnp.float32)
            std = jnp.asarray(WAN_VAE_LATENT_STD, jnp.float32)
        else:  # tiny test configs
            mean = jnp.zeros((self.cfg.z_dim,), jnp.float32)
            std = jnp.ones((self.cfg.z_dim,), jnp.float32)
        return mean, std

    def encode(self, x, normalize: bool = True, cache: Cache = None,
               return_cache: bool = False):
        h, caches = self.encoder(x, _get(cache, "encoder"))
        h, cc = self.conv1(h, _get(cache, "conv1"))
        mu, logvar = jnp.split(h, 2, axis=-1)
        if normalize:
            mean, std = self._latent_stats()
            mu = (mu - mean) / std
        if return_cache:
            return (mu, logvar), {"encoder": caches, "conv1": cc}
        return mu, logvar

    def decode(self, z, normalize: bool = True, cache: Cache = None,
               return_cache: bool = False, clip: bool = True):
        if normalize:
            mean, std = self._latent_stats()
            z = z * std + mean
        z = z.astype(self.cfg.dtype)
        h, cc = self.conv2(z, _get(cache, "conv2"))
        x, caches = self.decoder(h, _get(cache, "decoder"))
        if clip:
            x = jnp.clip(x, -1.0, 1.0)
        if return_cache:
            return x, {"decoder": caches, "conv2": cc}
        return x

    def __call__(self, x, rng=None):
        mu, logvar = self.encode(x)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        else:
            z = mu
        return self.decode(z), mu, logvar

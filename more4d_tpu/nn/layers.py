"""Shared neural-net primitives for the Wan stack.

Numerics mirror the reference modules (cited per symbol) but are written as
functional JAX/flax code: norms run in float32 and cast back, which matches the
reference's autocast behaviour on the hot path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RMSNorm(nn.Module):
    """RMS norm with learned scale (WanRMSNorm, wan_transformer4d.py:378-394)."""

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,),
                            self.param_dtype)
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed * weight.astype(jnp.float32)).astype(self.dtype)


def layer_norm(x, eps: float = 1e-6, weight=None, bias=None):
    """Affine-free layer norm in fp32 (WanLayerNorm, wan_transformer4d.py:397-407)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class LayerNormAffine(nn.Module):
    """Layer norm with learned scale/shift (norm3 when cross_attn_norm=True)."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          self.param_dtype)
        return layer_norm(x, self.eps, weight, bias)


def sinusoidal_embedding(dim: int, position):
    """[cos | sin] sinusoidal timestep embedding.

    Matches sinusoidal_embedding_1d (wan_transformer4d.py:236-249): cos block
    first. Positions are <= 1000 so float32 is sufficient for the outer
    product operands.
    """
    assert dim % 2 == 0
    half = dim // 2
    position = jnp.asarray(position, jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = jnp.outer(position.reshape(-1), freqs)
    emb = jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)
    return emb.reshape(*position.shape, dim)

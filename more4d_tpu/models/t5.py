"""umT5-xxl text encoder (JAX), matching the reference from-scratch T5
(MoRe4D/models/wan_text_encoder.py): un-scaled attention, GEGLU feed-forward
(tanh GELU), per-block bidirectional relative position embeddings
(shared_pos=False in config/wan2.1/wan_civital.yaml), final RMS-style
T5LayerNorm. Inference-only (dropout ignored).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5Config

NEG_INF = jnp.finfo(jnp.float32).min


class T5LayerNorm(nn.Module):
    """x * rsqrt(mean(x^2) + eps) * weight (wan_text_encoder.py:44-56)."""

    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,),
                       self.param_dtype)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True)
                               + self.eps)
        return (w.astype(jnp.float32) * y).astype(self.dtype)


def relative_position_buckets(lq: int, lk: int, num_buckets: int,
                              bidirectional: bool = True,
                              max_dist: int = 128) -> np.ndarray:
    """T5 relative position bucketing (wan_text_encoder.py:235-254)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).astype(np.int64) * nb
        rel_pos = np.abs(rel_pos)
    else:
        nb = num_buckets
        rel_buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets = rel_buckets + np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets


class T5RelativeEmbedding(nn.Module):
    num_buckets: int
    num_heads: int
    bidirectional: bool = True
    max_dist: int = 128
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lq: int, lk: int):
        table = self.param(
            "embedding",
            nn.initializers.normal(
                (2 * self.num_buckets * self.num_heads) ** -0.5),
            (self.num_buckets, self.num_heads), self.param_dtype)
        buckets = relative_position_buckets(lq, lk, self.num_buckets,
                                            self.bidirectional,
                                            self.max_dist)
        bias = table[jnp.asarray(buckets)]          # [Lq, Lk, H]
        return jnp.transpose(bias, (2, 0, 1))[None].astype(self.dtype)


class T5Attention(nn.Module):
    """No-scaling attention with additive bias (wan_text_encoder.py:59-109)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask=None, pos_bias=None):
        cfg = self.cfg
        n = cfg.num_heads
        c = cfg.dim_attn // n
        b, l, _ = x.shape
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        q = dense(cfg.dim_attn, "q")(x).reshape(b, l, n, c)
        k = dense(cfg.dim_attn, "k")(x).reshape(b, l, n, c)
        v = dense(cfg.dim_attn, "v")(x).reshape(b, l, n, c)

        attn = jnp.einsum("binc,bjnc->bnij", q.astype(jnp.float32),
                          k.astype(jnp.float32))
        if pos_bias is not None:
            attn = attn + pos_bias.astype(jnp.float32)
        if mask is not None:
            attn = jnp.where(mask[:, None, None, :] == 0, NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnij,bjnc->binc", attn, v).reshape(b, l, n * c)
        return dense(cfg.dim, "o")(out)


class T5FeedForward(nn.Module):
    """GEGLU: fc1(x) * gelu_tanh(gate(x)) -> fc2 (wan_text_encoder.py:112-130)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        gate = nn.gelu(dense(cfg.dim_ffn, "gate")(x), approximate=True)
        h = dense(cfg.dim_ffn, "fc1")(x) * gate
        return dense(cfg.dim, "fc2")(h)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, mask=None, pos_bias=None):
        cfg = self.cfg
        if not cfg.shared_pos:
            pos_bias = T5RelativeEmbedding(
                cfg.num_buckets, cfg.num_heads, bidirectional=True,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name="pos_embedding")(x.shape[1], x.shape[1])
        h = T5LayerNorm(cfg.dim, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm1")(x)
        x = x + T5Attention(cfg, name="attn")(h, mask, pos_bias)
        h = T5LayerNorm(cfg.dim, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm2")(x)
        x = x + T5FeedForward(cfg, name="ffn")(h)
        return x


class WanT5Encoder(nn.Module):
    """Returns [B, L, dim] hidden states (WanT5EncoderModel.forward)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab, cfg.dim, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="token_embedding")
        x = emb(input_ids)
        pos_bias = None
        if cfg.shared_pos:
            pos_bias = T5RelativeEmbedding(
                cfg.num_buckets, cfg.num_heads, bidirectional=True,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name="pos_embedding")(x.shape[1], x.shape[1])
        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"blocks_{i}")(x, attention_mask, pos_bias)
        x = T5LayerNorm(cfg.dim, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm")(x)
        return x


def convert_t5_state_dict(sd, cfg: T5Config):
    """Torch state dict (models_t5_umt5-xxl-enc-bf16.pth layout) -> params."""
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in sd.items()}

    def dense(key):
        return {"kernel": sd[key + ".weight"].T}

    def norm(key):
        return {"weight": sd[key + ".weight"]}

    params = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "norm": norm("norm"),
    }
    if cfg.shared_pos:
        params["pos_embedding"] = {
            "embedding": sd["pos_embedding.embedding.weight"]}
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        blk = {
            "norm1": norm(p + ".norm1"),
            "norm2": norm(p + ".norm2"),
            "attn": {n: dense(f"{p}.attn.{n}") for n in "qkvo"},
            "ffn": {"gate": dense(p + ".ffn.gate.0"),
                    "fc1": dense(p + ".ffn.fc1"),
                    "fc2": dense(p + ".ffn.fc2")},
        }
        if not cfg.shared_pos:
            blk["pos_embedding"] = {
                "embedding": sd[f"{p}.pos_embedding.embedding.weight"]}
        params[f"blocks_{i}"] = blk
    return {"params": params}

"""XLM-RoBERTa-large text tower (JAX) — the CLIP text branch.

Re-implements MoRe4D/models/wan_xlm_roberta.py: token + type + position
embeddings (positions from pad-aware cumsum), post-norm attention blocks,
padding mask as additive attention bias. The pipelines only use the CLIP
*vision* tower, but the text branch is part of the checkpoint and the CLIP
API surface (XLMRobertaWithHead average-pool + MLP head,
wan_image_encoder.py:305-327).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.finfo(jnp.float32).min


class RobertaBlock(nn.Module):
    dim: int
    num_heads: int
    post_norm: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, s, c = x.shape
        n = self.num_heads
        d = c // n

        def attn(h):
            q = nn.Dense(c, name="q", **kw)(h).reshape(b, s, n, d)
            k = nn.Dense(c, name="k", **kw)(h).reshape(b, s, n, d)
            v = nn.Dense(c, name="v", **kw)(h).reshape(b, s, n, d)
            logits = jnp.einsum("blnd,bmnd->bnlm", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * (d ** -0.5)
            logits = logits + bias
            p = jax.nn.softmax(logits, -1).astype(v.dtype)
            o = jnp.einsum("bnlm,bmnd->blnd", p, v).reshape(b, s, c)
            return nn.Dense(c, name="o", **kw)(o)

        def ffn(h):
            h = nn.Dense(4 * c, name="fc1", **kw)(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(c, name="fc2", **kw)(h)

        ln1 = nn.LayerNorm(epsilon=self.eps, name="norm1", **kw)
        ln2 = nn.LayerNorm(epsilon=self.eps, name="norm2", **kw)
        if self.post_norm:
            x = ln1(x + attn(x))
            x = ln2(x + ffn(x))
        else:
            x = x + attn(ln1(x))
            x = x + ffn(ln2(x))
        return x


class XLMRoberta(nn.Module):
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, s = ids.shape
        mask = (ids != self.pad_id).astype(jnp.int32)

        tok = nn.Embed(self.vocab_size, self.dim, name="token_embedding",
                       **kw)(ids)
        typ = nn.Embed(self.type_size, self.dim, name="type_embedding",
                       **kw)(jnp.zeros_like(ids))
        pos_ids = self.pad_id + jnp.cumsum(mask, axis=1) * mask
        pos = nn.Embed(self.max_seq_len, self.dim, name="pos_embedding",
                       **kw)(pos_ids)
        x = tok + typ + pos
        norm = nn.LayerNorm(epsilon=self.eps, name="norm", **kw)
        if self.post_norm:
            x = norm(x)

        bias = jnp.where(mask.reshape(b, 1, 1, s) > 0, 0.0, NEG_INF)
        for i in range(self.num_layers):
            x = RobertaBlock(self.dim, self.num_heads, self.post_norm,
                             self.eps, name=f"blocks_{i}", **kw)(x, bias)
        if not self.post_norm:
            x = norm(x)
        return x


class XLMRobertaWithHead(nn.Module):
    """Average-pooled features -> MLP head (wan_image_encoder.py:305-327)."""

    out_dim: int = 1024
    roberta_kwargs: Any = None

    @nn.compact
    def __call__(self, ids):
        kw = dict(self.roberta_kwargs or {})
        model = XLMRoberta(name="roberta", **kw)
        x = model(ids)
        pad_id = kw.get("pad_id", 1)
        dim = kw.get("dim", 1024)
        mask = (ids != pad_id).astype(x.dtype)[..., None]
        pooled = (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1e-6)
        mid = (dim + self.out_dim) // 2
        h = nn.Dense(mid, use_bias=False, name="head_fc1")(pooled)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.out_dim, use_bias=False, name="head_fc2")(h)


def convert_xlm_roberta_state_dict(sd, num_layers: int = 24):
    """Torch state dict -> flax params (prefix-free XLMRoberta layout)."""
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in sd.items()}

    def dense(key):
        return {"kernel": sd[key + ".weight"].T, "bias": sd[key + ".bias"]}

    def ln(key):
        return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}

    def emb(key):
        return {"embedding": sd[key + ".weight"]}

    params = {
        "token_embedding": emb("token_embedding"),
        "type_embedding": emb("type_embedding"),
        "pos_embedding": emb("pos_embedding"),
        "norm": ln("norm"),
    }
    for i in range(num_layers):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "q": dense(p + ".attn.q"), "k": dense(p + ".attn.k"),
            "v": dense(p + ".attn.v"), "o": dense(p + ".attn.o"),
            "norm1": ln(p + ".norm1"), "norm2": ln(p + ".norm2"),
            "fc1": dense(p + ".ffn.0"), "fc2": dense(p + ".ffn.2"),
        }
    return {"params": params}

"""DINOv2 ViT (patch-14) backbone, JAX — the encoder of the UniDepth-V2
monocular depth model (the reference's stage-1 entry point,
scripts/inference/infer.py:47,515-520,818: ``UniDepthV2old.infer``).

Mirrors the official facebookresearch/dinov2 ViT (as exposed by
``transformers.Dinov2Model``, the golden oracle in
tests/test_unidepth.py): Conv patch embed, cls token, learned position
embeddings with bicubic interpolation for arbitrary input sizes, pre-norm
blocks with LayerScale, GELU MLP, final LayerNorm.

``get_intermediate_layers`` reproduces the dinov2 API UniDepth consumes:
tokens of n selected blocks, layer-normed, split into (patch tokens,
cls token).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        n = self.num_heads
        d = c // n
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = nn.LayerNorm(epsilon=self.eps, name="norm1", **kw)(x)
        qkv = nn.Dense(3 * c, name="qkv", **kw)(h)
        q, k, v = [t.reshape(b, l, n, d) for t in jnp.split(qkv, 3, -1)]
        s = jnp.einsum("blnd,bmnd->bnlm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (d ** -0.5)
        p = jax.nn.softmax(s, -1).astype(v.dtype)
        o = jnp.einsum("bnlm,bmnd->blnd", p, v).reshape(b, l, c)
        o = nn.Dense(c, name="attn_proj", **kw)(o)
        ls1 = self.param("ls1", nn.initializers.ones, (c,),
                         self.param_dtype)
        x = x + o * ls1.astype(o.dtype)

        h = nn.LayerNorm(epsilon=self.eps, name="norm2", **kw)(x)
        h = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1", **kw)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="mlp_fc2", **kw)(h)
        ls2 = self.param("ls2", nn.initializers.ones, (c,),
                         self.param_dtype)
        return x + h * ls2.astype(h.dtype)


class DinoV2ViT(nn.Module):
    """DINOv2 ViT-L/14 by default (dim 1024, 24 layers, 16 heads)."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    pos_grid: int = 37            # 518 / 14 — the pretraining pos-emb grid
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.patch_proj = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (1, 1, self.embed_dim), self.param_dtype)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, self.embed_dim),
            self.param_dtype)
        self.blocks = [DinoBlock(self.embed_dim, self.num_heads,
                                 self.mlp_ratio, self.eps, self.dtype,
                                 self.param_dtype, name=f"blocks_{i}")
                       for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="norm")

    def _interp_pos(self, gh: int, gw: int):
        """Bicubic pos-embed interpolation (dinov2 interpolate_pos_encoding)."""
        pos = self.pos_embed.astype(jnp.float32)
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if gh == self.pos_grid and gw == self.pos_grid:
            return cls_pos, patch_pos
        patch_pos = patch_pos.reshape(1, self.pos_grid, self.pos_grid,
                                      self.embed_dim)
        patch_pos = jax.image.resize(patch_pos, (1, gh, gw, self.embed_dim),
                                     "bicubic")
        return cls_pos, patch_pos.reshape(1, gh * gw, self.embed_dim)

    def _embed(self, x):
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = self.patch_proj(x).reshape(b, gh * gw, self.embed_dim)
        cls_pos, patch_pos = self._interp_pos(gh, gw)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.embed_dim))
        cls = cls.astype(tokens.dtype) + cls_pos.astype(tokens.dtype)
        tokens = tokens + patch_pos.astype(tokens.dtype)
        return jnp.concatenate([cls, tokens], axis=1), (gh, gw)

    def __call__(self, x):
        """x [B, H, W, 3] normalized. Returns final-norm tokens
        [B, 1+N, C] (cls first) and the patch grid."""
        h, grid = self._embed(x)
        for blk in self.blocks:
            h = blk(h)
        return self.norm(h), grid

    def get_intermediate_layers(self, x, layer_ids: Sequence[int],
                                apply_norm: bool = True):
        """Tokens of the selected blocks (dinov2 get_intermediate_layers
        with norm=True, return_class_token=True): list of
        (patch_tokens [B, N, C], cls [B, C]) plus the patch grid."""
        h, grid = self._embed(x)
        wanted = set(int(i) for i in layer_ids)
        outs = {}
        for i, blk in enumerate(self.blocks):
            h = blk(h)
            if i in wanted:
                outs[i] = h
        result = []
        for i in sorted(wanted):
            t = self.norm(outs[i]) if apply_norm else outs[i]
            result.append((t[:, 1:], t[:, 0]))
        return result, grid


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def convert_dinov2_state_dict(sd, depth: int = 24, consumed=None):
    """Torch -> flax params. Accepts both naming schemes:
    - official dinov2 (blocks.N.attn.qkv, ls1.gamma, patch_embed.proj, ...)
    - transformers Dinov2Model (encoder.layer.N.attention..., layer_scale1
      .lambda1, embeddings.patch_embeddings.projection, ...).

    ``consumed``: optional set — every checkpoint key the mapping reads is
    added, so a strict caller can report the exact unconsumed leftovers
    (load_unidepth_strict's backbone pre-check).
    """
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in sd.items()}

    def get(*names):
        for n in names:
            if n in sd:
                if consumed is not None:
                    consumed.add(n)
                return sd[n]
        raise KeyError(names[0])

    def dense(*names):
        w = get(*[n + ".weight" for n in names])
        out = {"kernel": w.T}
        try:
            out["bias"] = get(*[n + ".bias" for n in names])
        except KeyError:
            pass
        return out

    def ln(*names):
        return {"scale": get(*[n + ".weight" for n in names]),
                "bias": get(*[n + ".bias" for n in names])}

    conv_w = get("patch_embed.proj.weight",
                 "embeddings.patch_embeddings.projection.weight")
    params = {
        "patch_proj": {
            "kernel": np.transpose(conv_w, (2, 3, 1, 0)),
            "bias": get("patch_embed.proj.bias",
                        "embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": get("cls_token", "embeddings.cls_token"),
        "pos_embed": get("pos_embed", "embeddings.position_embeddings"),
        "norm": ln("norm", "layernorm"),
    }
    for i in range(depth):
        o, t = f"blocks.{i}", f"encoder.layer.{i}"
        blk = {
            "norm1": ln(o + ".norm1", t + ".norm1"),
            "attn_proj": dense(o + ".attn.proj",
                               t + ".attention.output.dense"),
            "norm2": ln(o + ".norm2", t + ".norm2"),
            "mlp_fc1": dense(o + ".mlp.fc1", t + ".mlp.fc1"),
            "mlp_fc2": dense(o + ".mlp.fc2", t + ".mlp.fc2"),
            "ls1": get(o + ".ls1.gamma", t + ".layer_scale1.lambda1"),
            "ls2": get(o + ".ls2.gamma", t + ".layer_scale2.lambda1"),
        }
        if o + ".attn.qkv.weight" in sd:
            blk["qkv"] = dense(o + ".attn.qkv")
        else:  # transformers splits q/k/v
            qw = get(t + ".attention.attention.query.weight")
            kw_ = get(t + ".attention.attention.key.weight")
            vw = get(t + ".attention.attention.value.weight")
            qb = get(t + ".attention.attention.query.bias")
            kb = get(t + ".attention.attention.key.bias")
            vb = get(t + ".attention.attention.value.bias")
            blk["qkv"] = {"kernel": np.concatenate([qw, kw_, vw], 0).T,
                          "bias": np.concatenate([qb, kb, vb], 0)}
        params[f"blocks_{i}"] = blk
    return {"params": params}

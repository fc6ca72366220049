"""CLIP ViT-H/14 image encoder (vision tower of open-clip
XLM-RoBERTa-large + ViT-H/14), JAX.

Re-implements MoRe4D/models/wan_image_encoder.py for the only use the
pipelines make of it: ``CLIPModel.forward`` (:503-528) -> 257 penultimate
visual tokens (``use_31_block=True`` drops the last transformer block and the
final norm/head). Pre-norm blocks, plain GELU activation, bias-free patch
conv (pre_norm=True), learned cls + position embeddings.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPVisionConfig

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images, image_size: int = 224):
    """[B,H,W,3] in [-1,1] -> bicubic resize + CLIP normalization
    (CLIPModel.forward :516-524)."""
    b = images.shape[0]
    x = jax.image.resize(images, (b, image_size, image_size, 3), "bicubic")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std


class _LayerNorm(nn.Module):
    """fp32 layer norm cast back (wan_image_encoder.py:48-52)."""

    dim: int
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                            param_dtype=self.param_dtype)(
            x.astype(jnp.float32)).astype(x.dtype)


class ClipBlock(nn.Module):
    """Pre-norm attention block with fused qkv (wan_image_encoder.py:55-156)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, l, c = x.shape
        n = cfg.num_heads
        d = c // n

        h = _LayerNorm(c, param_dtype=cfg.param_dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="to_qkv")(h)
        q, k, v = [t.reshape(b, l, n, d) for t in jnp.split(qkv, 3, -1)]
        s = jnp.einsum("blnd,bmnd->bnlm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (d ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnlm,bmnd->blnd", p, v).reshape(b, l, c)
        x = x + nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="attn_proj")(o)

        h = _LayerNorm(c, param_dtype=cfg.param_dtype, name="norm2")(x)
        h = nn.Dense(int(c * cfg.mlp_ratio), dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="mlp_fc2")(h)
        return x + h


class ClipVisionTower(nn.Module):
    """Returns penultimate tokens [B, 1+P, dim] (use_31_block semantics)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, penultimate: bool = True):
        cfg = self.cfg
        b = x.shape[0]
        num_patches = (cfg.image_size // cfg.patch_size) ** 2

        h = nn.Conv(cfg.dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="patch_embedding")(x)
        h = h.reshape(b, -1, cfg.dim)

        gain = cfg.dim ** -0.5
        cls = self.param("cls_embedding", nn.initializers.normal(gain),
                         (1, 1, cfg.dim), cfg.param_dtype)
        pos = self.param("pos_embedding", nn.initializers.normal(gain),
                         (1, num_patches + 1, cfg.dim), cfg.param_dtype)
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.dim)
                                              ).astype(h.dtype), h], axis=1)
        h = h + pos.astype(h.dtype)
        h = _LayerNorm(cfg.dim, param_dtype=cfg.param_dtype,
                       name="pre_norm")(h)

        n_blocks = cfg.num_layers - 1 if penultimate else cfg.num_layers
        for i in range(n_blocks):
            h = ClipBlock(cfg, name=f"blocks_{i}")(h)
        return h


def encode_image(model: ClipVisionTower, params, images):
    """images [B,H,W,3] in [-1,1] -> [B, 257, 1280] context tokens."""
    x = clip_preprocess(images, model.cfg.image_size)
    return model.apply(params, x)


def convert_clip_vision_state_dict(sd, cfg: CLIPVisionConfig,
                                   prefix: str = "visual."):
    """Torch (open-clip style, reference layout) -> flax params."""
    sd = {k[len(prefix):]: (v.detach().cpu().float().numpy()
                            if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items() if k.startswith(prefix)}

    def dense(key):
        out = {"kernel": sd[key + ".weight"].T}
        if key + ".bias" in sd:
            out["bias"] = sd[key + ".bias"]
        return out

    def ln(key):
        return {"LayerNorm_0": {"scale": sd[key + ".weight"],
                                "bias": sd[key + ".bias"]}}

    params = {
        "patch_embedding": {
            "kernel": np.transpose(sd["patch_embedding.weight"],
                                   (2, 3, 1, 0))},
        "cls_embedding": sd["cls_embedding"],
        "pos_embedding": sd["pos_embedding"],
        "pre_norm": ln("pre_norm"),
    }
    n_blocks = sum(1 for k in sd if k.endswith(".to_qkv.weight"))
    for i in range(min(n_blocks, cfg.num_layers - 1)):
        p = f"transformer.{i}"
        params[f"blocks_{i}"] = {
            "norm1": ln(p + ".norm1"),
            "to_qkv": dense(p + ".attn.to_qkv"),
            "attn_proj": dense(p + ".attn.proj"),
            "norm2": ln(p + ".norm2"),
            "mlp_fc1": dense(p + ".mlp.0"),
            "mlp_fc2": dense(p + ".mlp.2"),
        }
    return {"params": params}

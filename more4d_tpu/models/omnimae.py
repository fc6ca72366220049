"""OmniMAE ViT-B feature extractor for the Motion Perception Module (JAX).

Re-implements the only path MoRe4D uses (wan_transformer4d.py:882-893,
1127-1158): ``vit_base_mae_pretraining().trunk.forward_patch_features`` —
bilinear-resize the (ImageNet-normalized) first frame to 224^2, repeat it to
a 2-frame clip, patchify with a Conv3d [2,16,16], add a fixed sinusoid
position table, run 12 pre-norm ViT blocks, final LayerNorm; return all 196
patch tokens and token 0 as the pooled feature
(omnivision/models/vision_transformer.py:688-703; no cls token,
first_patch_idx=0, pre_logits=Identity).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """get_sinusoid_encoding_table (vision_transformer.py:31-46)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    table = np.where(j % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class ViTBlock(nn.Module):
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
        x = x + nn.Dense(c, name="attn_proj", **kw)(o)

        h = nn.LayerNorm(epsilon=self.eps, name="norm2", **kw)(x)
        h = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1", **kw)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="mlp_fc2", **kw)(h)
        return x + h


class OmniMAEViT(nn.Module):
    """forward_patch_features: [B, 224, 224, 3] (normalized) ->
    (patch tokens [B, 196, D], pooled [B, D])."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: Tuple[int, int, int] = (2, 16, 16)
    image_size: int = 224
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        pt, ph, pw = self.patch_size
        # PadIm2Video 'repeat' (omnivision/__init__.py PadIm2Video) + Conv3d
        clip = jnp.broadcast_to(x[:, None], (b, pt) + x.shape[1:])
        h = nn.Conv(self.embed_dim, self.patch_size,
                    strides=self.patch_size, padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_proj")(clip)
        h = h.reshape(b, -1, self.embed_dim)

        n_pos = (self.image_size // ph) * (self.image_size // pw)
        pos = sinusoid_table(n_pos, self.embed_dim)
        h = h + jnp.asarray(pos)[None].astype(h.dtype)

        for i in range(self.depth):
            h = ViTBlock(self.embed_dim, self.num_heads, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"blocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(h)
        return h, h[:, 0]


def extract_mpm_features(model: OmniMAEViT, params, images01):
    """images01 [B,H,W,3] in [0,1] -> (tokens, pooled). Applies the ImageNet
    normalization + 224 bilinear resize done at the MPM tap point
    (wan_transformer4d.py:1133-1141, vision_transformer.py:690)."""
    b = images01.shape[0]
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (images01 - mean) / std
    size = model.image_size
    x = jax.image.resize(x, (b, size, size, 3), "bilinear")
    return model.apply(params, x)


# trunk geometries of the reference's three factory families
# (MoRe4D/models/omnimae.py:77 vit_base, :267 vit_large, :458 vit_huge —
# identical structure, different width/depth/patch; the pipeline consumes
# ViT-B, wan_transformer4d.py:884, but all three load here)
OMNIMAE_VARIANTS = {
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12,
                     patch_size=(2, 16, 16)),
    "vit_large": dict(embed_dim=1024, depth=24, num_heads=16,
                      patch_size=(2, 16, 16)),
    "vit_huge": dict(embed_dim=1280, depth=32, num_heads=16,
                     patch_size=(2, 14, 14)),
}


def infer_omnimae_variant(sd) -> str:
    """Identify B/L/H from a trunk state dict: the patch Conv3d weight is
    [D, 3, pt, ph, pw] and the block count is explicit in the keys."""
    keys = {k[len("trunk."):] if k.startswith("trunk.") else k: k
            for k in sd}
    conv_key = ("patch_embed.proj.1.weight"
                if "patch_embed.proj.1.weight" in keys
                else "patch_embed.proj.weight")
    w = sd[keys[conv_key]]
    dim, ph = int(w.shape[0]), int(w.shape[3])
    depth = 1 + max(int(k.split(".")[1]) for k in keys
                    if k.startswith("blocks."))
    for name, v in OMNIMAE_VARIANTS.items():
        if (v["embed_dim"], v["depth"], v["patch_size"][1]) == (dim, depth,
                                                                ph):
            return name
    raise ValueError(f"unrecognized OmniMAE trunk: dim={dim} depth={depth} "
                     f"patch={ph}")


def omnimae_vit(variant: str = "vit_base", **kw) -> OmniMAEViT:
    """Factory mirroring vit_{base,large,huge}_mae_pretraining (trunk
    encoder only — the MAE decoder/head is pretrain-dead for MPM)."""
    return OmniMAEViT(**{**OMNIMAE_VARIANTS[variant], **kw})


def convert_omnimae_state_dict(sd, depth: int = 12):
    """Torch trunk state dict -> flax params. Keys follow the reference
    trunk: patch_embed.proj.1 (Conv3d after PadIm2Video), blocks.N.*, norm."""
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in sd.items()}
    sd = {k[len("trunk."):] if k.startswith("trunk.") else k: v
          for k, v in sd.items()}

    def dense(key):
        return {"kernel": sd[key + ".weight"].T, "bias": sd[key + ".bias"]}

    def ln(key):
        return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}

    conv_key = ("patch_embed.proj.1" if "patch_embed.proj.1.weight" in sd
                else "patch_embed.proj")
    params = {
        "patch_proj": {
            "kernel": np.transpose(sd[conv_key + ".weight"],
                                   (2, 3, 4, 1, 0)),
            "bias": sd[conv_key + ".bias"],
        },
        "norm": ln("norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": ln(p + ".norm1"),
            "qkv": dense(p + ".attn.qkv"),
            "attn_proj": dense(p + ".attn.proj"),
            "norm2": ln(p + ".norm2"),
            "mlp_fc1": dense(p + ".mlp.fc1"),
            "mlp_fc2": dense(p + ".mlp.fc2"),
        }
    return {"params": params}

"""Motion-sensitive VAE adaptor pair (trajectory <-> pseudo-RGB).

Re-implements ``VAEEncoderadaptor`` / ``VAEDecoderadaptor``
(MoRe4D/models/trajectory_module.py:125-279): tiny per-frame 2D CNNs wrapped
around the frozen Wan video VAE so it can encode/decode 3-channel xyz
scene-flow tensors instead of RGB.

- encoder adaptor: conv_in(3->128) -> ResnetBlock -> GroupNorm/swish ->
  zero-init conv_out(128->3), then ``sigmoid(h + x)`` (residual on the raw
  input) => pseudo-RGB in [0, 1] (:177-196).
- decoder adaptor: conv_in(3->128) -> 2x ResnetBlock -> GroupNorm/swish ->
  conv_out(128->3) => xyz flow (:260-279).

Layout: [B, T, H, W, C]; frames are processed independently.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ResnetBlock2D(nn.Module):
    """GroupNorm(32)/swish/conv x2 (trajectory_module.py:63-122, temb_ch=0)."""

    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-6, name="norm1", **kw)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, name="conv1", **kw)(h)
        h = nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-6, name="norm2", **kw)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, name="conv2", **kw)(h)
        return x + h


class VAEEncoderAdaptor(nn.Module):
    ch: int = 128
    in_channels: int = 3
    num_res_blocks: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xf = x.reshape(b * t, hh, ww, c)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in", **kw)(xf)
        for i in range(self.num_res_blocks):
            h = ResnetBlock2D(self.ch, name=f"block_{i}", **kw)(h)
        h = nn.GroupNorm(num_groups=min(32, self.ch), epsilon=1e-6,
                         name="norm_out", **kw)(h)
        h = nn.silu(h)
        h = nn.Conv(self.in_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv_out",
                    **kw)(h)
        out = nn.sigmoid(h + xf)
        return out.reshape(b, t, hh, ww, c)


class VAEDecoderAdaptor(nn.Module):
    ch: int = 128
    in_channels: int = 3
    out_channels: int = 3
    num_res_blocks: int = 1  # reference uses num_res_blocks+1 blocks
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        b, t, hh, ww, c = z.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        zf = z.reshape(b * t, hh, ww, c)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in", **kw)(zf)
        for i in range(self.num_res_blocks + 1):
            h = ResnetBlock2D(self.ch, name=f"block_{i}", **kw)(h)
        h = nn.GroupNorm(num_groups=min(32, self.ch), epsilon=1e-6,
                         name="norm_out", **kw)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out",
                    **kw)(h)
        return h.reshape(b, t, hh, ww, self.out_channels)


def load_adaptor(path: str, decoder: bool):
    """Adaptor params from either a reference torch .bin/.pth or an orbax
    checkpoint dir written by scripts/train_vae.py (its 'params' tree is
    {'enc', 'dec', optional 'vae_decoder'}) — train-here feeds infer-here
    without conversion. Returns (params, vae_decoder_or_None); the second
    element carries the fine-tuned VAE decoder/conv2 subtree when the
    checkpoint has one, for callers that patch the base VAE."""
    import os

    if os.path.isdir(path):
        from ..train.checkpoint import CheckpointManager

        mgr = CheckpointManager(path)
        tree = mgr.restore_params()
        mgr.close()
        return tree["dec" if decoder else "enc"], tree.get("vae_decoder")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_adaptor_state_dict(sd, decoder=decoder), None


def convert_adaptor_state_dict(sd, decoder: bool):
    """Torch state dict -> flax params for either adaptor."""
    import numpy as np

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}

    def conv(key):
        return {"kernel": np.transpose(sd[key + ".weight"], (2, 3, 1, 0)),
                "bias": sd[key + ".bias"]}

    def norm(key):
        return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}

    seq = "up.0.block" if decoder else "down.0.block"
    n = sum(1 for k in sd if k.startswith(seq) and k.endswith("conv1.weight"))
    params = {"conv_in": conv("conv_in"), "conv_out": conv("conv_out"),
              "norm_out": norm("norm_out")}
    for i in range(n):
        params[f"block_{i}"] = {
            "norm1": norm(f"{seq}.{i}.norm1"),
            "conv1": conv(f"{seq}.{i}.conv1"),
            "norm2": norm(f"{seq}.{i}.norm2"),
            "conv2": conv(f"{seq}.{i}.conv2"),
        }
    return {"params": params}

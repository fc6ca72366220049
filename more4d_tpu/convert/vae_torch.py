"""Torch -> flax weight conversion for the Wan causal video VAE.

Converts a ``Wan2.1_VAE.pth``-style state dict (raw keys ``encoder.*``,
``decoder.*``, ``conv1.*``, ``conv2.*`` — the reference prefixes them with
``model.`` at load time, wan_vae.py:859-868) into the parameter pytree of
:class:`more4d_tpu.models.wan_vae.WanVAE`.

Tensor layout transforms:
- Conv3d  [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]
- Conv2d  [O, I, kh, kw]     -> [kh, kw, I, O]
- RMS_norm gamma (C,1,1)/(C,1,1,1) -> (C,)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import VAEConfig


def _conv3(sd, key):
    w = np.transpose(np.asarray(sd[key + ".weight"]), (2, 3, 4, 1, 0))
    return {"kernel": w, "bias": np.asarray(sd[key + ".bias"])}


def _conv2(sd, key):
    w = np.transpose(np.asarray(sd[key + ".weight"]), (2, 3, 1, 0))
    return {"kernel": w, "bias": np.asarray(sd[key + ".bias"])}


def _gamma(sd, key):
    return {"gamma": np.asarray(sd[key + ".gamma"]).reshape(-1)}


def _res_block(sd, key):
    out = {
        "norm1": _gamma(sd, key + ".residual.0"),
        "conv1": {"conv": _conv3(sd, key + ".residual.2")},
        "norm2": _gamma(sd, key + ".residual.3"),
        "conv2": {"conv": _conv3(sd, key + ".residual.6")},
    }
    if key + ".shortcut.weight" in sd:
        out["shortcut"] = {"conv": _conv3(sd, key + ".shortcut")}
    return out


def _attention(sd, key):
    return {
        "norm": _gamma(sd, key + ".norm"),
        "to_qkv": _conv2(sd, key + ".to_qkv"),
        "proj": _conv2(sd, key + ".proj"),
    }


def _coder(sd, prefix: str, cfg: VAEConfig, decode: bool) -> Dict:
    tree: Dict = {"conv1": {"conv": _conv3(sd, prefix + ".conv1")}}
    seq = "upsamples" if decode else "downsamples"
    n_blocks = cfg.num_res_blocks + (1 if decode else 0)
    n_stages = len(cfg.dim_mult)
    temporal = (tuple(cfg.temporal_downsample)[::-1] if decode
                else tuple(cfg.temporal_downsample))
    name = "up" if decode else "down"

    idx = 0
    for i in range(n_stages):
        for _ in range(n_blocks):
            tree[f"{name}_{idx}"] = _res_block(sd, f"{prefix}.{seq}.{idx}")
            idx += 1
        if i != n_stages - 1:
            key = f"{prefix}.{seq}.{idx}"
            tree[f"{name}_{idx}_s"] = {"conv": _conv2(sd, key + ".resample.1")}
            if temporal[i]:
                tree[f"{name}_{idx}"] = {
                    "time_conv": _conv3(sd, key + ".time_conv")}
            idx += 1

    tree["mid_res1"] = _res_block(sd, prefix + ".middle.0")
    tree["mid_attn"] = _attention(sd, prefix + ".middle.1")
    tree["mid_res2"] = _res_block(sd, prefix + ".middle.2")
    tree["head_norm"] = _gamma(sd, prefix + ".head.0")
    tree["head_conv"] = {"conv": _conv3(sd, prefix + ".head.2")}
    return tree


def convert_vae_state_dict(sd, cfg: VAEConfig):
    """sd: mapping of torch-key -> array (torch tensors or numpy)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    params = {
        "encoder": _coder(sd, "encoder", cfg, decode=False),
        "decoder": _coder(sd, "decoder", cfg, decode=True),
        "conv1": {"conv": _conv3(sd, "conv1")},
        "conv2": {"conv": _conv3(sd, "conv2")},
    }
    return {"params": params}


def load_wan_vae(path: str, cfg: VAEConfig = VAEConfig()):
    """Load the released Wan2.1 VAE checkpoint (.pth or .safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_vae_state_dict(sd, cfg)

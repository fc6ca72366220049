"""Kohya-style LoRA safetensors -> more4d_tpu LoRA factor tree.

The reference saves ViSM LoRA weights with kohya naming
(``lora_unet_<module path with _>_lora_down.weight`` [r, in] /
``lora_up.weight`` [out, r] / ``alpha``; MoRe4D/utils/lora_utils.py:22-112)
and merges them at weight 0.55 at inference (infer.py:1031). This converter
produces the factor tree consumed by more4d_tpu.train.lora.apply_lora,
stacking per-block factors for the scanned block layout.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ..config import DiTConfig


def convert_kohya_lora(sd, cfg: DiTConfig, prefix: str = "lora_unet_"):
    """sd: torch-key -> tensor. Returns {'rank', 'alpha', 'factors'}."""
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in sd.items()}

    pat = re.compile(
        rf"^{re.escape(prefix)}blocks_(\d+)_(.+)\.lora_down\.weight$")
    per_layer: Dict[str, Dict[int, dict]] = {}
    rank, alpha = None, 1.0
    for k, down in sd.items():
        m = pat.match(k)
        if not m:
            continue
        layer = int(m.group(1))
        module = m.group(2)           # e.g. self_attn_q / ffn_0
        base = k[:-len(".lora_down.weight")]
        up = sd[base + ".lora_up.weight"]
        if base + ".alpha" in sd:
            alpha = float(sd[base + ".alpha"])
        rank = down.shape[0]
        # torch Linear lora_down [r, in] -> flax down [in, r]; up [out, r]
        # -> [r, out]
        per_layer.setdefault(module, {})[layer] = {
            "down": down.T, "up": up.T}

    def flax_path(module: str) -> str:
        # self_attn_q -> self_attn/q ; ffn_0 -> ffn/fc1 ; ffn_2 -> ffn/fc2
        module = module.replace("ffn_0", "ffn/fc1").replace("ffn_2",
                                                            "ffn/fc2")
        for attn in ("self_attn", "cross_attn"):
            module = module.replace(attn + "_", attn + "/")
        if cfg.scan_blocks:
            return f"params/blocks/block/{module}/kernel"
        return f"params/blocks_{{i}}/{module}/kernel"

    factors = {}
    for module, layers in per_layer.items():
        if cfg.scan_blocks:
            idxs = sorted(layers)
            down = np.stack([layers[i]["down"] for i in idxs])
            up = np.stack([layers[i]["up"] for i in idxs])
            factors[flax_path(module)] = {"down": down, "up": up}
        else:
            for i, f in layers.items():
                factors[flax_path(module).format(i=i)] = dict(f)
    return {"rank": rank or 4, "alpha": alpha, "factors": factors}


def export_kohya_lora(lora, prefix: str = "lora_unet_"):
    """Inverse of convert_kohya_lora: our LoRA factor tree -> a kohya-named
    numpy state dict (``lora_down.weight`` [r, in] / ``lora_up.weight``
    [out, r] / ``alpha``), loadable by the reference's merge_lora
    (lora_utils.py:368) — LoRA trained HERE ships back to the torch
    ecosystem. Round-trip exact: convert_kohya_lora(export_kohya_lora(x))
    == x (tested)."""

    def kohya_module(path: str) -> str:
        # params/blocks/block/self_attn/q/kernel -> self_attn_q;
        # .../ffn/fc1/kernel -> ffn_0 ; fc2 -> ffn_2
        inner = path.split("blocks/block/")[-1] if "blocks/block/" in path \
            else re.sub(r"^params/blocks_\d+/", "", path)
        inner = inner[:-len("/kernel")]
        inner = inner.replace("ffn/fc1", "ffn_0").replace("ffn/fc2",
                                                          "ffn_2")
        return inner.replace("/", "_")

    alpha = float(np.asarray(lora["alpha"]))
    sd = {}
    for path, f in lora["factors"].items():
        down = np.asarray(f["down"], np.float32)
        up = np.asarray(f["up"], np.float32)
        mod = kohya_module(path)
        if down.ndim == 3:          # scanned stack [L, in, r]
            for i in range(down.shape[0]):
                base = f"{prefix}blocks_{i}_{mod}"
                sd[base + ".lora_down.weight"] = down[i].T
                sd[base + ".lora_up.weight"] = up[i].T
                sd[base + ".alpha"] = np.float32(alpha)
        else:
            m = re.match(r"^params/blocks_(\d+)/", path)
            i = int(m.group(1)) if m else 0
            base = f"{prefix}blocks_{i}_{mod}"
            sd[base + ".lora_down.weight"] = down.T
            sd[base + ".lora_up.weight"] = up.T
            sd[base + ".alpha"] = np.float32(alpha)
    return sd


def save_kohya_lora(path: str, lora):
    """Write the exported kohya state dict as .safetensors."""
    from safetensors.numpy import save_file

    save_file(export_kohya_lora(lora), path)


def load_vism_lora(path: str, cfg: DiTConfig):
    """Load a LoRA for merge: either a reference kohya checkpoint
    (.safetensors / torch .pth, lora_utils.py key layout) or a directory
    written by OUR trainers' orbax CheckpointManager (scripts/train_vism.py)
    — the factor tree restores as-is, so train-here -> infer-here needs no
    format conversion."""
    import os

    if os.path.isdir(path):
        import jax
        import numpy as np

        from ..train.checkpoint import CheckpointManager

        mgr = CheckpointManager(path)
        lora = mgr.restore_params()
        mgr.close()
        if "dit" in lora and "te" in lora:
            # --train_text_encoder run: the DiT factors merge here; the
            # text-encoder factors would need the raw T5 tower (the infer
            # CLI uses the frozen encode_text closure)
            print("NOTE: checkpoint carries text-encoder LoRA factors; "
                  "only the DiT factors are merged at inference")
            lora = lora["dit"]
        rank = lora["rank"]
        alpha = lora["alpha"]
        return {"rank": int(np.asarray(rank)),
                "alpha": float(np.asarray(alpha)),
                "factors": jax.tree_util.tree_map(np.asarray,
                                                  lora["factors"])}
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_kohya_lora(sd, cfg)

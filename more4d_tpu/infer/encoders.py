"""Conditioning-encoder bundle shared by the inference and training CLIs.

Builds the three frozen conditioning towers the 4D-STraG DiT consumes
(reference: train_wan.py:1871-1950, pipeline_wan_fun_control.py:191-233):

- text:  tokenizer + umT5-xxl -> context [B, text_len, 4096], embeddings
  zeroed past each prompt's true length (the reference trims to seq_lens
  and re-pads with zeros, train_wan.py:1896-1899);
- clip:  CLIP ViT-H -> 257 penultimate visual tokens per image, fed to the
  DiT's i2v cross-attention branch (train_wan.py:1845-1854);
- mpm:   OmniMAE ViT-B patch tokens [B, 196, 768] for the Motion Perception
  Module FiLM path (wan_transformer4d.py:1127-1158).

Everything is exposed as plain callables so tests can swap in tiny
stand-ins (the same seam TwoStageModels uses).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ConditioningEncoders:
    encode_text: Callable[[Sequence[str]], jnp.ndarray]
    encode_clip: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    extract_mpm: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None


def _cast_float_leaves(tree, weight_dtype):
    from ..utils.quantize import cast_float_leaves

    return cast_float_leaves(tree, weight_dtype)


def build_text_encoder(t5_ckpt: str, tokenizer_path: str,
                       jit: bool = True, weight_dtype=None):
    """tokenizer + umT5 -> encode_text(prompts)->[B, text_len, text_dim]."""
    import jax
    import torch
    from transformers import AutoTokenizer

    from ..config import T5Config
    from ..models.t5 import WanT5Encoder, convert_t5_state_dict

    cfg = T5Config()
    t5 = WanT5Encoder(cfg)
    params = _cast_float_leaves(convert_t5_state_dict(
        torch.load(t5_ckpt, map_location="cpu", weights_only=True), cfg),
        weight_dtype)
    tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
    apply = t5.apply
    if jit:
        apply = jax.jit(apply)

    def encode_text(prompts: Sequence[str]) -> jnp.ndarray:
        toks = tokenizer(list(prompts), padding="max_length",
                         truncation=True, max_length=cfg.text_len,
                         add_special_tokens=True, return_tensors="np")
        mask = jnp.asarray(toks["attention_mask"], jnp.float32)
        emb = apply(params, jnp.asarray(toks["input_ids"]), mask)
        return emb * mask[..., None]

    return encode_text


def build_clip_encoder(clip_ckpt: str, jit: bool = True,
                       weight_dtype=None):
    """CLIP ViT-H vision tower -> encode_clip(images[-1,1])->[B,257,1280]."""
    import jax
    import torch

    from ..config import CLIPVisionConfig
    from ..models.clip import (ClipVisionTower, clip_preprocess,
                               convert_clip_vision_state_dict)

    cfg = CLIPVisionConfig()
    tower = ClipVisionTower(cfg)
    params = _cast_float_leaves(convert_clip_vision_state_dict(
        torch.load(clip_ckpt, map_location="cpu", weights_only=True), cfg),
        weight_dtype)
    apply = tower.apply
    if jit:
        apply = jax.jit(apply)

    def encode_clip(images: jnp.ndarray) -> jnp.ndarray:
        return apply(params, clip_preprocess(images, cfg.image_size))

    return encode_clip


def build_mpm_extractor(omnimae_ckpt: str, jit: bool = True,
                        weight_dtype=None):
    """OmniMAE trunk -> extract_mpm(images01) -> [B, N, D] patch tokens.

    The B/L/H variant is detected from the checkpoint's own geometry
    (ViT-B is the pipeline's, wan_transformer4d.py:884; L/H load the
    same way — pair them with a matching DiT motion_feature_dim)."""
    import jax
    import torch

    from ..models.omnimae import (convert_omnimae_state_dict,
                                  extract_mpm_features,
                                  infer_omnimae_variant, omnimae_vit,
                                  OMNIMAE_VARIANTS)

    sd = torch.load(omnimae_ckpt, map_location="cpu", weights_only=True)
    # released 4D-STraG checkpoints EMBED the frozen trunk in the DiT state
    # dict under 'omnimae_extractor.' (wan_transformer4d.py:884) — accept
    # the combined file directly by stripping the prefix
    emb = {k[len("omnimae_extractor."):]: v for k, v in sd.items()
           if k.startswith("omnimae_extractor.")}
    if emb:
        sd = emb
    variant = infer_omnimae_variant(sd)
    model = omnimae_vit(variant)
    params = _cast_float_leaves(convert_omnimae_state_dict(
        sd, depth=OMNIMAE_VARIANTS[variant]["depth"]), weight_dtype)

    def _raw(images01):
        tokens, _ = extract_mpm_features(model, params, images01)
        return tokens

    return jax.jit(_raw) if jit else _raw


def build_encoders(t5_ckpt: Optional[str] = None,
                   tokenizer_path: str = "google/umt5-xxl",
                   clip_ckpt: Optional[str] = None,
                   omnimae_ckpt: Optional[str] = None,
                   text_dim: int = 4096, text_len: int = 512,
                   jit: bool = True,
                   allow_dummy_text: bool = False,
                   weight_dtype=None) -> ConditioningEncoders:
    """Assemble the bundle from checkpoint paths; missing towers yield None.

    A missing t5_ckpt is a hard error unless ``allow_dummy_text`` — silently
    training/inferring with zero text embeddings is a footgun (the model
    sees the unconditional context for every prompt)."""
    if t5_ckpt:
        encode_text = build_text_encoder(t5_ckpt, tokenizer_path, jit=jit,
                                         weight_dtype=weight_dtype)
    else:
        if not allow_dummy_text:
            raise ValueError(
                "no t5_ckpt given: text conditioning would be all-zeros. "
                "Pass --t5_ckpt, or --allow_dummy_text to opt in "
                "explicitly (tests/smoke runs only).")
        print("WARNING: no --t5_ckpt; text conditioning will be zeros")

        def encode_text(prompts):
            return jnp.zeros((len(prompts), text_len, text_dim),
                             jnp.float32)

    encode_clip = build_clip_encoder(clip_ckpt, jit=jit,
                                     weight_dtype=weight_dtype) \
        if clip_ckpt else None
    extract_mpm = build_mpm_extractor(omnimae_ckpt, jit=jit,
                                      weight_dtype=weight_dtype) \
        if omnimae_ckpt else None
    return ConditioningEncoders(encode_text=encode_text,
                                encode_clip=encode_clip,
                                extract_mpm=extract_mpm)

"""FP8 weight storage (halves HBM for 14B inference).

Re-implements MoRe4D/utils/fp8_optimization.py: the reference casts
transformer weights to float8_e4m3 for storage and autocasts to bf16 on
forward (convert_model_weight_to_float8 :19, convert_weight_dtype_wrapper
:47 — no scales). We add an optional per-tensor scale (amax / 448) for
robustness; scale=None reproduces the reference's direct cast.

Usage: q = quantize_params_fp8(params); dit.apply(dequantize_params(q), ...)
— under jit the dequant fuses into the consumers, so HBM traffic is fp8.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # float8_e4m3fn max normal


def cast_float_leaves(tree: Any, dtype) -> Any:
    """The reference's .to(weight_dtype) for a param pytree: cast every
    floating leaf (infer.py:554,572,589-596 casts T5/CLIP/VAE/DiT alike).
    dtype=None returns the tree untouched."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def _should_quantize(path: str, leaf) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    # keep norms/embeddings/modulation tables in high precision
    for k in ("norm", "modulation", "embedding"):
        if k in path.lower():
            return False
    return True


def quantize_params_fp8(params: Any, scaled: bool = True) -> Any:
    """Returns a tree where large kernels become
    {'fp8': float8 array, 'scale': scalar} (or raw fp8 when scaled=False)."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if _should_quantize(prefix, tree):
            x = tree.astype(jnp.float32)
            if scaled:
                scale = jnp.maximum(jnp.max(jnp.abs(x)) / FP8_MAX, 1e-12)
                return {"fp8": (x / scale).astype(jnp.float8_e4m3fn),
                        "scale": scale.astype(jnp.float32)}
            return tree.astype(jnp.float8_e4m3fn)
        return tree

    return walk(params)


def dequantize_params(params: Any, dtype=jnp.bfloat16) -> Any:
    def walk(tree):
        if isinstance(tree, dict):
            if set(tree.keys()) == {"fp8", "scale"}:
                return (tree["fp8"].astype(jnp.float32)
                        * tree["scale"]).astype(dtype)
            return {k: walk(v) for k, v in tree.items()}
        if hasattr(tree, "dtype") and tree.dtype == jnp.float8_e4m3fn:
            return tree.astype(dtype)
        return tree

    return walk(params)

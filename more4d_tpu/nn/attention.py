"""Attention dispatch: Pallas flash kernel on TPU, XLA fallback elsewhere.

Mirrors the reference's backend-switching `attention` wrapper
(wan_transformer4d.py:66-236) which picks FA3/FA2/SDPA; here the choice is
pallas vs. plain XLA, controlled by config or the VIDEOX_ATTENTION_TYPE-style
env override MORE4D_ATTENTION.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention, xla_attention


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              kv_lens: Optional[jnp.ndarray] = None,
              backend: str = "auto") -> jnp.ndarray:
    """Scaled dot-product attention. q/k/v: [B, L, H, D] (BLHD)."""
    backend = os.environ.get("MORE4D_ATTENTION", backend)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return flash_attention(q, k, v, kv_lens=kv_lens)
    if backend == "pallas_interpret":
        return flash_attention(q, k, v, kv_lens=kv_lens, interpret=True)
    if backend == "xla":
        return xla_attention(q, k, v, kv_lens=kv_lens)
    raise ValueError(f"unknown attention backend: {backend}")

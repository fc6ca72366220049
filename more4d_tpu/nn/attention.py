"""Attention dispatch: Pallas flash kernel on TPU, XLA fallback elsewhere,
optional Ulysses sequence parallelism.

Mirrors the reference's backend-switching `attention` wrapper
(wan_transformer4d.py:66-236) which picks FA3/FA2/SDPA via
VIDEOX_ATTENTION_TYPE; here the choice is pallas vs. plain XLA, controlled by
config or the env override MORE4D_ATTENTION. When a mesh with a non-trivial
'seq' axis is installed (more4d_tpu.parallel.set_mesh), self-attention calls
route through the Ulysses all-to-all wrapper — the TPU equivalent of the
reference's usp_attn_forward monkey-patch (:1038-1044).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention, xla_attention


def _blocks():
    """Flash tile sizes; env-overridable for tuning (MORE4D_FLASH_BQ/BK).
    BK defaults to the padding-minimising adaptive rule (sweep on v5e at
    L=9568: fixed tiles <=1024 lose up to 20%, adaptive 4864 wins)."""
    bk = os.environ.get("MORE4D_FLASH_BK", "adaptive")
    return (int(os.environ.get("MORE4D_FLASH_BQ", "512")),
            None if bk in ("adaptive", "") else int(bk))


def _base(backend: str, ckpt_name: Optional[str] = None):
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        bq, bk = _blocks()
        return lambda q, k, v, lens: flash_attention(q, k, v, kv_lens=lens,
                                                     block_q=bq, block_k=bk,
                                                     ckpt_name=ckpt_name)
    if backend == "pallas_interpret":
        bq, bk = _blocks()
        return lambda q, k, v, lens: flash_attention(q, k, v, kv_lens=lens,
                                                     block_q=bq, block_k=bk,
                                                     ckpt_name=ckpt_name,
                                                     interpret=True)
    if backend == "xla":
        return lambda q, k, v, lens: xla_attention(q, k, v, kv_lens=lens)
    raise ValueError(f"unknown attention backend: {backend}")


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              kv_lens: Optional[jnp.ndarray] = None,
              backend: str = "auto",
              sequence_parallel: bool = False,
              ckpt_name: Optional[str] = None) -> jnp.ndarray:
    """Scaled dot-product attention. q/k/v: [B, L, H, D] (BLHD).

    ckpt_name: remat-policy residual tag, forwarded to the flash kernel
    (save_only_these_names support — see kernels/flash_attention.py)."""
    backend = os.environ.get("MORE4D_ATTENTION", backend)
    fn = _base(backend, ckpt_name)
    if sequence_parallel:
        from ..parallel.ulysses import seq_parallel_size, ulysses_attention

        if seq_parallel_size() > 1:
            return ulysses_attention(fn, q, k, v, kv_lens)
    return fn(q, k, v, kv_lens)

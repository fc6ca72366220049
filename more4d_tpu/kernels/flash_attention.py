"""Pallas TPU flash attention (forward) with online softmax.

TPU-native replacement for the reference's flash-attn-2/3 CUDA dependency
(MoRe4D/models/wan_transformer4d.py:29-236). All attention calls in the Wan
pipelines use fixed-length padded sequences with an optional key-length mask
(`k_lens`), so we implement dense attention with per-batch kv-length masking —
no varlen ragged batching is needed.

Layout: q [B, H, Lq, D], k/v [B, H, Lk, D]; grid (B*H, Lq/bq, Lk/bk) with the
kv dimension innermost ("arbitrary") so the online-softmax state (m, l, acc)
persists in VMEM scratch across kv blocks. fp32 accumulation, bf16 MXU inputs.

The backward pass currently recomputes attention with the XLA reference path
(memory O(L^2)); a Pallas backward kernel replaces it for large-scale training.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(kv_lens_ref, q_ref, k_ref, v_ref, o_ref,
                      m_scr, l_scr, acc_scr, *,
                      sm_scale: float, block_k: int, num_heads: int,
                      masked: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [bq, D]
    k = k_ref[0]                      # [bk, D]
    v = v_ref[0]                      # [bk, D]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale

    if masked:
        b = pl.program_id(0) // num_heads
        kv_len = kv_lens_ref[b]
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def _flash_forward(q, k, v, kv_lens, sm_scale, block_q, block_k, interpret):
    """q: [B, H, Lq, D]; k, v: [B, H, Lk, D]; kv_lens: [B] int32 or None."""
    b, h, lq, d = q.shape
    lk = k.shape[2]

    masked = kv_lens is not None or (lk % block_k != 0)
    if kv_lens is None:
        kv_lens = jnp.full((b,), lk, jnp.int32)

    block_q = min(block_q, max(lq, 8))
    block_k = min(block_k, max(lk, 8))
    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    lqp, lkp = qp.shape[2], kp.shape[2]

    qp = qp.reshape(b * h, lqp, d)
    kp = kp.reshape(b * h, lkp, d)
    vp = vp.reshape(b * h, lkp, d)

    grid = (b * h, lqp // block_q, lkp // block_k)
    kernel = functools.partial(
        _flash_fwd_kernel, sm_scale=sm_scale, block_k=block_k,
        num_heads=h, masked=masked)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i, j, _: (bh, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda bh, i, j, _: (bh, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qp, kp, vp)

    return out.reshape(b, h, lqp, d)[:, :, :lq, :]


def _xla_attention(q, k, v, kv_lens, sm_scale):
    """Reference O(L^2) attention, used for the backward pass and as fallback."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if kv_lens is not None:
        mask = jnp.arange(k.shape[2])[None, :] < kv_lens[:, None]
        s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_core(q, k, v, kv_lens, sm_scale, block_q, block_k,
                          interpret):
    return _flash_forward(q, k, v, kv_lens, sm_scale, block_q, block_k,
                          interpret)


def _core_fwd(q, k, v, kv_lens, sm_scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, kv_lens, sm_scale, block_q, block_k,
                         interpret)
    return out, (q, k, v, kv_lens)


def _core_bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_lens = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, kv_lens,
                                                       sm_scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    kv_lens: Optional[jnp.ndarray] = None,
                    sm_scale: Optional[float] = None,
                    block_q: int = 256, block_k: int = 512,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Flash attention over [B, L, H, D] tensors (BLHD layout like flash-attn).

    kv_lens: optional [B] int32 — keys at positions >= kv_lens[b] are masked
    (the reference's `k_lens` semantics, wan_transformer4d.py:136-169).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _flash_attention_core(qt, kt, vt, kv_lens, sm_scale, block_q,
                                block_k, interpret)
    return jnp.swapaxes(out, 1, 2)


def xla_attention(q, k, v, kv_lens=None, sm_scale=None):
    """Plain XLA attention in BLHD layout (testing/fallback)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    out = _xla_attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                         jnp.swapaxes(v, 1, 2), kv_lens, sm_scale)
    return jnp.swapaxes(out, 1, 2)

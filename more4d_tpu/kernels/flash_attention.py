"""Pallas TPU flash attention (forward + backward) with online softmax.

TPU-native replacement for the reference's flash-attn-2/3 CUDA dependency
(MoRe4D/models/wan_transformer4d.py:29-236; the reference trains through
fused attention fwd+bwd). All attention calls in the Wan pipelines use
fixed-length padded sequences with an optional key-length mask (`k_lens`),
so we implement dense attention with per-batch kv-length masking — no varlen
ragged batching is needed.

Layout: q [B, H, Lq, D], k/v [B, H, Lk, D]; grid (B*H, Lq/bq, Lk/bk) with the
kv dimension innermost ("arbitrary") so the online-softmax state (m, l, acc)
persists in VMEM scratch across kv blocks. fp32 accumulation, bf16 MXU inputs.

Backward (FlashAttention-2 scheme, memory O(L)):
- forward additionally emits the per-row logsumexp;
- delta = rowsum(dO * O) is a cheap XLA pass;
- a dq kernel (grid kv-innermost) and a dk/dv kernel (grid q-innermost)
  recompute probability blocks from q, k and the saved logsumexp. Score
  blocks are formed kv-major ([bk, bq]) so lse/delta broadcast along the
  TPU lane dimension without relayouts.

The O(L^2) XLA path remains as `backward="xla"` fallback and as the parity
oracle in tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # softmax via exp2: exp(x) == exp2(x * log2 e);
                            # folding log2e into the scale trades the VPU's
                            # exp for the cheaper exp2 (flash-attn's trick).
                            # lse is stored in base-2 units, consistently
                            # consumed by the backward kernels.
NUM_SUBLANES = 8  # lse/delta row vectors are stored [bh, 8, Lq] (q on
                  # lanes, replicated over 8 sublanes) to satisfy the TPU
                  # (8, 128) block-shape constraint without relayouts in
                  # the backward kernels.


def _flash_fwd_kernel(kv_lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr, *,
                      block_k: int, num_heads: int, masked: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [bq, D], pre-scaled by scale*log2e
    k = k_ref[0]                      # [bk, D]
    v = v_ref[0]                      # [bk, D]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    if masked:
        # Unconditional kv-length mask.  NOTE: do NOT gate this behind a
        # jax.lax.cond on a "block is interior" scalar predicate — the cond
        # duplicates the [bq, bk] fp32 score block's liveness and blows the
        # 16 MiB scoped-VMEM limit at the production tile (bq=512, bk=4864:
        # 26.95M requested; zeroed BENCH_r04).  The plain where costs ~3 VPU
        # ops/element but compiles everywhere and benched 1.2551 steps/s.
        b = pl.program_id(0) // num_heads
        kv_len = kv_lens_ref[b]
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
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
        # base-2 logsumexp (matches the exp2 backward recompute)
        lse = m_scr[:] + jnp.log2(jnp.maximum(l_scr[:], 1e-30))  # [bq, 1]
        lse_ref[0] = jnp.broadcast_to(lse[:, 0][None, :],
                                      (NUM_SUBLANES, lse.shape[0]))


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def _adaptive_block_k(lk: int, cap: int = 4864) -> int:
    """Pick the kv tile that minimises padding: the smallest number of kv
    iterations whose tile fits VMEM (cap), tile rounded up to the 128-lane
    granule. At the Wan operating point (Lk=9568) this gives 4864 (2
    iterations, 1.7% pad) vs 7% pad for a fixed 1024. Measured +1% MFU on
    v5e; larger single-tile variants exceed scoped VMEM."""
    if lk <= 1024:
        return lk
    n_iters = -(-lk // cap)
    per = -(-lk // n_iters)
    return min(-(-per // 128) * 128, cap)


def _flash_forward(q, k, v, kv_lens, sm_scale, block_q, block_k, interpret):
    """q: [B, H, Lq, D]; k, v: [B, H, Lk, D]; kv_lens: [B] int32 or None."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if block_k is None:
        block_k = _adaptive_block_k(lk)

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

    # fold scale*log2e into q once (L*D elements, fused into the pad by
    # XLA) instead of multiplying every L^2 score element in-kernel
    qp = qp * jnp.asarray(sm_scale * LOG2E, qp.dtype)

    grid = (b * h, lqp // block_q, lkp // block_k)
    kernel = functools.partial(
        _flash_fwd_kernel, block_k=block_k, num_heads=h, masked=masked)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i, j, _: (bh, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i, j, _: (bh, i, 0)),
                pl.BlockSpec((1, NUM_SUBLANES, block_q),
                             lambda bh, i, j, _: (bh, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, NUM_SUBLANES, lqp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qp, kp, vp)

    return out.reshape(b, h, lqp, d)[:, :, :lq, :], lse


# ---------------------------------------------------------------------------
# Backward kernels (FlashAttention-2 two-kernel scheme).
#
# Both kernels form the score block kv-major: s_t = k @ q^T [bk, bq], so the
# per-q-row logsumexp/delta vectors broadcast along lanes. q-padding is
# harmless because dO is zero there (=> ds, dv, dk contributions vanish);
# kv padding/kv_lens are masked to -inf before exp.
# ---------------------------------------------------------------------------


def _bwd_pt_block(q, k, lse_row, kv_lens_ref, ki, num_heads, block_k,
                  masked):
    """Recompute p^T [bk, bq] for one (q block, k block) pair.  q arrives
    pre-scaled by sm_scale*log2e (see _flash_backward).  The kv mask is
    applied unconditionally — see the forward kernel's note on why a
    lax.cond block gate VMEM-OOMs at production tiles."""
    s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if masked:
        b = pl.program_id(0) // num_heads
        kv_len = kv_lens_ref[b]
        row = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      s_t.shape, 0)
        s_t = jnp.where(row < kv_len, s_t, NEG_INF)
    return jnp.exp2(s_t - lse_row[None, :])


def _flash_bwd_dq_kernel(kv_lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, dq_scr, *,
                         sm_scale: float, block_k: int, num_heads: int,
                         masked: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]                 # [bq, D]
    k = k_ref[0]                 # [bk, D]
    v = v_ref[0]                 # [bk, D]
    do = do_ref[0]               # [bq, D]
    lse_row = lse_ref[0, 0, :]   # [bq] (lane vector)
    delta_row = delta_ref[0, 0, :]

    p_t = _bwd_pt_block(q, k, lse_row, kv_lens_ref, ki, num_heads, block_k,
                        masked)                               # [bk, bq]
    # dp^T = v @ do^T
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_t = p_t * (dp_t - delta_row[None, :]) * sm_scale       # [bk, bq]
    # dq += ds^T @ k  == contract ds_t dim0 with k dim0
    dq_scr[:] += jax.lax.dot_general(
        ds_t.astype(k.dtype), k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(kv_lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                          sm_scale: float, block_k: int, num_heads: int,
                          masked: bool):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse_row = lse_ref[0, 0, :]
    delta_row = delta_ref[0, 0, :]

    p_t = _bwd_pt_block(q, k, lse_row, kv_lens_ref, ki, num_heads, block_k,
                        masked)                               # [bk, bq]
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [bk, D]
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_t = p_t * (dp_t - delta_row[None, :]) * sm_scale
    # q is pre-scaled by scale*log2e, so this accumulates dk * scale*log2e;
    # the finalize divides it back out IN THE fp32 SCRATCH (free + exact)
    dk_scr[:] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [bk, D]

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = (dk_scr[:] * (1.0 / (LOG2E * sm_scale))).astype(
            dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_lens, o, lse, g, sm_scale, block_q, block_k,
                    interpret):
    """dq, dk, dv with O(L) memory. q/k/v/o/g: [B, H, L, D]; lse [B*H, Lqp]."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if block_k is None:
        block_k = 1024   # bwd scratch is 2x per tile; fixed tile is safe

    masked = kv_lens is not None or (lk % block_k != 0)
    if kv_lens is None:
        kv_lens = jnp.full((b,), lk, jnp.int32)

    block_q = min(block_q, max(lq, 8))
    block_k = min(block_k, max(lk, 8))
    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    gp = _pad_to(g, 2, block_q)
    op = _pad_to(o, 2, block_q)
    lqp, lkp = qp.shape[2], kp.shape[2]

    qp = qp.reshape(b * h, lqp, d)
    kp = kp.reshape(b * h, lkp, d)
    vp = vp.reshape(b * h, lkp, d)
    gp = gp.reshape(b * h, lqp, d)
    op = op.reshape(b * h, lqp, d)
    # pre-scale q once (matches the forward; see _bwd_pt_block).  The dk
    # accumulator divides the factor back out in its fp32 finalize.
    qp = qp * jnp.asarray(sm_scale * LOG2E, qp.dtype)

    # delta_i = sum_d dO_i O_i — one cheap fused elementwise+reduce pass,
    # broadcast to the [bh, 8, Lq] row-vector layout.
    delta = jnp.sum(gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :],
                             (b * h, NUM_SUBLANES, lqp))

    nq, nk = lqp // block_q, lkp // block_k

    q_spec = pl.BlockSpec((1, block_q, d), lambda bh, i, j, _: (bh, i, 0))
    kv_spec_dq = pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, j, 0))
    row_spec = pl.BlockSpec((1, NUM_SUBLANES, block_q),
                            lambda bh, i, j, _: (bh, 0, i))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, sm_scale=sm_scale,
                          block_k=block_k, num_heads=h, masked=masked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, nq, nk),
            in_specs=[q_spec, kv_spec_dq, kv_spec_dq, q_spec, row_spec,
                      row_spec],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda bh, i, j, _: (bh, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qp, kp, vp, gp, lse, delta)

    # dk/dv: q innermost; note index roles swap (i = kv block, j = q block).
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda bh, i, j, _: (bh, j, 0))
    kv_spec2 = pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, i, 0))
    row_spec2 = pl.BlockSpec((1, NUM_SUBLANES, block_q),
                             lambda bh, i, j, _: (bh, 0, j))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, sm_scale=sm_scale,
                          block_k=block_k, num_heads=h, masked=masked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, nk, nq),
            in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2,
                      row_spec2],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, i, j, _: (bh, i, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                            pltpu.VMEM((block_k, d), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lkp, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lkp, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qp, kp, vp, gp, lse, delta)

    dq = dq.reshape(b, h, lqp, d)[:, :, :lq]
    dk = dk.reshape(b, h, lkp, d)[:, :, :lk]
    dv = dv.reshape(b, h, lkp, d)[:, :, :lk]
    return dq, dk, dv


def _xla_attention(q, k, v, kv_lens, sm_scale):
    """Reference O(L^2) attention, used for the backward pass and as fallback."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if kv_lens is not None:
        mask = jnp.arange(k.shape[2])[None, :] < kv_lens[:, None]
        s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash_attention_core(q, k, v, kv_lens, sm_scale, block_q, block_k,
                          block_k_bwd, interpret, backward, ckpt_name):
    out, _ = _flash_forward(q, k, v, kv_lens, sm_scale, block_q, block_k,
                            interpret)
    return out


def _core_fwd(q, k, v, kv_lens, sm_scale, block_q, block_k, block_k_bwd,
              interpret, backward, ckpt_name):
    out, lse = _flash_forward(q, k, v, kv_lens, sm_scale, block_q, block_k,
                              interpret)
    if ckpt_name is not None:
        # Residual checkpointing hook (remat_policy='flash'): naming the
        # custom-vjp RESIDUALS themselves lets
        # jax.checkpoint_policies.save_only_these_names keep (o, lse)
        # across a rematerialised block, so the backward pass never
        # re-executes the O(L^2) forward kernel — the recompute walk
        # shrinks to the cheap projections/norms.  Names must be applied
        # here (not by the caller, post-call) or the saved value is a
        # different jaxpr var from the residual and the kernel re-runs.
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, f"{ckpt_name}_o")
        lse = checkpoint_name(lse, f"{ckpt_name}_lse")
    return out, (q, k, v, kv_lens, out, lse)


def _core_bwd(sm_scale, block_q, block_k, block_k_bwd, interpret, backward,
              ckpt_name, res, g):
    q, k, v, kv_lens, o, lse = res
    if backward == "pallas":
        dq, dk, dv = _flash_backward(q, k, v, kv_lens, o, lse, g, sm_scale,
                                     block_q,
                                     block_k_bwd if block_k_bwd is not None
                                     else block_k, interpret)
    else:  # O(L^2) XLA fallback
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention(q_, k_, v_, kv_lens, sm_scale),
            q, k, v)
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    kv_lens: Optional[jnp.ndarray] = None,
                    sm_scale: Optional[float] = None,
                    block_q: int = 512,
                    block_k: Optional[int] = None,
                    block_k_bwd: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    backward: str = "pallas",
                    ckpt_name: Optional[str] = None) -> jnp.ndarray:
    """Flash attention over [B, L, H, D] tensors (BLHD layout like flash-attn).

    kv_lens: optional [B] int32 — keys at positions >= kv_lens[b] are masked
    (the reference's `k_lens` semantics, wan_transformer4d.py:136-169).
    block_k: None picks the padding-minimising kv tile (forward); the
    backward kernels default to a fixed 1024 (their scratch doubles per
    tile) unless block_k_bwd overrides it (bench.py fa_tune sweeps it).
    backward: "pallas" (O(L) memory, default) or "xla" (dense recompute).
    ckpt_name: tag the (o, lse) residuals '<ckpt_name>_o'/'<ckpt_name>_lse'
    for save_only_these_names remat policies (see _core_fwd).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if k.shape[1] == 0:
        # empty key set (e.g. an i2v cross-attention called without clip
        # context): softmax over zero keys — match the XLA fallback's
        # zeros output instead of tiling a zero-length kv axis
        return jnp.zeros_like(q)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _flash_attention_core(qt, kt, vt, kv_lens, sm_scale, block_q,
                                block_k, block_k_bwd, interpret, backward,
                                ckpt_name)
    return jnp.swapaxes(out, 1, 2)


def xla_attention(q, k, v, kv_lens=None, sm_scale=None):
    """Plain XLA attention in BLHD layout (testing/fallback)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    out = _xla_attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                         jnp.swapaxes(v, 1, 2), kv_lens, sm_scale)
    return jnp.swapaxes(out, 1, 2)

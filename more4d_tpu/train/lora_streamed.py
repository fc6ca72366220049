"""Streamed-base LoRA training: fine-tune a DiT bigger than HBM.

The reference fine-tunes the 14B Wan-Fun-InP with LoRA under DeepSpeed
ZeRO-2 on multi-GPU (scripts/4D_ViSM_training/train.py:859-868, train.sh).
On one 16 GiB TPU chip the 17.04B-param tree cannot even be resident, so
this module extends the inference-only host-streaming path
(parallel/offload.py) with a BACKWARD pass:

- frozen base block weights live fp8 in pinned host memory and stream
  into HBM twice per step — once in the forward walk, once more in the
  backward walk's per-block recompute (gradient checkpointing at block
  granularity, the streamed analog of ``--gradient_checkpointing``);
- only the per-block INPUT activations are saved between the walks
  (40 x [B, L, D] bf16 ~ 3.9 GiB at the 14B operating point);
- trainable LoRA factors (kohya semantics, train/lora.py) are
  HBM-resident fp32; each block applies ``W + scale * down @ up`` exactly
  as ``apply_lora`` so a streamed step computes the same gradients as the
  resident trainer (tested in tests/test_lora_streamed.py);
- the whole step is 5 dispatches (prep -> embed -> fwd walk ->
  loss tail -> bwd walk -> update), each a single jitted graph, matching
  the dispatch discipline that measured fastest for streaming on this
  relay (parallel/offload.py StreamedDiT.denoise docstring).

Loss/timestep-sampling semantics mirror ``make_vism_train_step``
(train_vism.py): stratified sigma sampling, flow-matching target
``noise - x``, thresholded MSE (train_wan.py:1952-1962).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.offload import StreamedDiT
from .optim import custom_mse_loss
from .sampler import (StratifiedTimestepSampler, loss_weighting_sd3,
                      timestep_density_u)
from .train_straag import training_schedule

_BLOCK_MARK = "blocks/block/"


def lora_block_paths(factors: dict) -> dict:
    """Map block-relative kernel path -> full factor-tree path.

    ``create_lora`` keys factors by full-tree paths
    (``params/blocks/block/self_attn/q/kernel``); the streamed walk merges
    into per-layer block trees whose paths are relative
    (``self_attn/q/kernel``)."""
    out = {}
    for path in factors:
        idx = path.find(_BLOCK_MARK)
        if idx >= 0:
            out[path[idx + len(_BLOCK_MARK):]] = path
    return out


class StreamedLoRATrainer(StreamedDiT):
    """Train LoRA factors against a host-streamed frozen base.

    ``lora`` is the tree from ``create_lora`` built on the FULL scanned
    param tree (factor leaves carry a leading [num_layers] axis); the
    base ``resident``/``host_blocks`` come from ``split_block_params`` +
    ``offload_blocks_to_host`` (or ``make_host_blocks`` for shape-only
    runs).  Non-block factors (none under DEFAULT_TARGETS) are ignored.
    """

    def __init__(self, model, resident, host_blocks, tx,
                 lora_rank: int = 4, lora_alpha: float = 1.0,
                 lora_multiplier: float = 1.0, rel2full: Optional[dict] = None,
                 max_grad_norm: float = 1.0, mse_threshold: float = 50.0,
                 shift: float = 5.0, num_train_timesteps: int = 1000,
                 uniform_sampling: bool = True, world_size: int = 1,
                 weighting_scheme: str = "none", logit_mean: float = 0.0,
                 logit_std: float = 1.0, mode_scale: float = 1.29,
                 rope_tables=None, acts_on_host: bool = False,
                 bwd_chunk: int = 4):
        super().__init__(model, resident, host_blocks,
                         rope_tables=rope_tables)
        self.tx = tx
        # park the saved per-block inputs in pinned host memory between the
        # walks (40 x ~98 MB at the 14B operating point would otherwise
        # pin ~3.9 GiB of HBM across the whole step); each one streams
        # back into HBM right before its block's backward recompute
        self.acts_on_host = bool(acts_on_host)
        # the backward walk runs in chunks of ``bwd_chunk`` blocks per
        # jitted graph: one 40-block backward graph needs 41.7 GiB of HLO
        # temps on the v5e (XLA interleaves the independent per-block VJP
        # outputs instead of serialising them), so the live set must be
        # bounded by construction.  All full chunks share ONE compile.
        self.bwd_chunk = max(int(bwd_chunk), 1)
        self.scale = float(lora_multiplier * lora_alpha / lora_rank)
        self.rel2full = rel2full or {}
        self.max_grad_norm = float(max_grad_norm)
        self.mse_threshold = float(mse_threshold)
        self.sigmas = jnp.asarray(
            training_schedule(num_train_timesteps, shift))
        self.uniform_sampling = bool(uniform_sampling)
        self.num_train_timesteps = int(num_train_timesteps)
        self.weighting_scheme = str(weighting_scheme)
        self.logit_mean = float(logit_mean)
        self.logit_std = float(logit_std)
        self.mode_scale = float(mode_scale)
        self.sampler = StratifiedTimestepSampler(
            num_train_timesteps, uniform_sampling=uniform_sampling,
            world_size=world_size)

    # ------------------------------------------------------------------ #

    def _apply_block_lora(self, w_tree, factors_k, h, it, mpm, mask):
        """Apply one block with LoRA as a SIDE-PATH on every matched Dense:
        ``dense(x) + scale * (x @ down) @ up``.

        Mathematically identical to merging ``W + scale * down @ up``
        (x @ (W + sD) + b == (x @ W + b) + s * (x @ down) @ up), but the
        merge materializes a full-size delta AND a merged copy of every
        weight matrix — ~1.7 GiB extra in flight per 14B block, which is
        exactly what OOM'd the streamed forward walk on the 16 GiB v5e.
        The side-path adds only O(L * r * (in + out)) flops and memory."""
        import flax.linen as fnn

        from ..models.wan_dit import _ProjParams

        def interceptor(next_fn, args, kwargs, context):
            out = next_fn(*args, **kwargs)
            if context.method_name != "__call__":
                return out
            if isinstance(context.module, fnn.Dense):
                rel = "/".join(str(p) for p in context.module.path) \
                    + "/kernel"
                f = factors_k.get(self.rel2full.get(rel, rel))
                if f is not None:
                    x = args[0]
                    d = f["down"].astype(out.dtype)
                    u = f["up"].astype(out.dtype)
                    out = out + self.scale * jnp.matmul(
                        jnp.matmul(x.astype(out.dtype), d), u)
            elif isinstance(context.module, _ProjParams):
                # fused-qkv self-attention (the dit_14b/dit_1_3b default):
                # q/k/v kernels are raw _ProjParams, not Dense — merge the
                # LoRA delta into the RETURNED kernel. Unlike the full-block
                # weight merge (which OOM'd, see docstring) this transient
                # is one [dim, dim] delta per projection, and the fused
                # matmul consumes it immediately.
                rel = "/".join(str(p) for p in context.module.path) \
                    + "/kernel"
                f = factors_k.get(self.rel2full.get(rel, rel))
                if f is not None:
                    kern, bias = out
                    d = f["down"].astype(kern.dtype)
                    u = f["up"].astype(kern.dtype)
                    out = (kern + self.scale * jnp.matmul(d, u), bias)
            return out

        with fnn.intercept_methods(interceptor):
            return self._block.apply({"params": w_tree}, h, it.e0,
                                     it.context, it.rope_cos, it.rope_sin,
                                     it.kv_lens, mpm, mask)

    def _slice_layer(self, factors, k):
        return {p: {"down": f["down"][k], "up": f["up"][k]}
                for p, f in factors.items()}

    def _block_args(self, it):
        from ..models.wan_dit import zero_mpm_fallback

        return zero_mpm_fallback(self.cfg, it.tokens, it.mpm_tokens,
                                 it.mpm_mask)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _prep(self, latents, rng, rank):
        """Noising + target, bit-matching make_vism_train_step's prep
        (incl. the SD3 density path + loss weighting when
        uniform_sampling is False / weighting_scheme is set)."""
        rng_t, rng_n = jax.random.split(rng)
        x = latents.astype(jnp.float32)
        b = x.shape[0]
        if self.uniform_sampling:
            idx = self.sampler(rng_t, b, rank)
        else:
            u = timestep_density_u(rng_t, self.weighting_scheme, b,
                                   self.logit_mean, self.logit_std,
                                   self.mode_scale)
            idx = jnp.clip((u * self.num_train_timesteps).astype(jnp.int32),
                           0, self.num_train_timesteps - 1)
        sigma = self.sigmas[idx].reshape(b, 1, 1, 1, 1)
        t = (self.sigmas[idx] * 1000.0).astype(jnp.float32)
        loss_weight = loss_weighting_sd3(self.weighting_scheme, sigma)
        noise = jax.random.normal(rng_n, x.shape, jnp.float32)
        zt = (1.0 - sigma) * x + sigma * noise
        target = noise - x
        return zt, t, target, loss_weight

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fwd_collect(self, hbs, factors, it):
        """Forward walk; returns (tokens_out, tuple of per-block inputs —
        NOT one stacked array: 40 separate ~98 MB buffers avoid a single
        multi-GiB contiguous allocation, and with ``acts_on_host`` each is
        device_put to pinned host as soon as the next block consumes it).
        ONE graph: XLA overlaps block k+1's host->HBM copy with block k's
        compute and frees each block's weight buffers after use."""
        mpm, mask = self._block_args(it)
        h = it.tokens
        saved = []
        for k, w in enumerate(hbs):
            saved.append(jax.device_put(h, self._s_host)
                         if self.acts_on_host else h)
            wd = self._dequant(jax.device_put(w, self._s_dev))
            h = self._apply_block_lora(wd, self._slice_layer(factors, k),
                                       h, it, mpm, mask)
        return h, tuple(saved)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _loss_tail(self, resident, tokens, it, target, loss_weight):
        from ..models.wan_dit import WanDiT

        def lf(tok):
            pred = self.model.apply(resident, tok, it,
                                    method=WanDiT.finalize)
            return custom_mse_loss(pred, target, weighting=loss_weight,
                                   threshold=self.mse_threshold)

        return jax.value_and_grad(lf)(tokens)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _slice_factor_chunk(self, factors, k0):
        """Layers [k0, k0 + bwd_chunk) of the stacked factor tree (one
        compile for every chunk: k0 is traced, the length static)."""
        g = self.bwd_chunk
        return {p: {"down": jax.lax.dynamic_slice_in_dim(f["down"], k0, g),
                    "up": jax.lax.dynamic_slice_in_dim(f["up"], k0, g)}
                for p, f in factors.items()}

    @functools.partial(jax.jit, static_argnums=(0,))
    def _bwd_chunk_fn(self, hbs_chunk, factors_chunk, saved_chunk, it, g):
        """Backward over ONE chunk of blocks (reverse order): re-stream
        each block's weights, recompute its forward inside jax.vjp, pull
        gradients to (its LoRA factors, its input).  Returns (stacked
        factor grads [G, ...] for the chunk, cotangent for the previous
        chunk's output)."""
        mpm, mask = self._block_args(it)
        n = len(hbs_chunk)
        g_layers = [None] * n
        for j in reversed(range(n)):
            wd = self._dequant(jax.device_put(hbs_chunk[j], self._s_dev))
            fj = self._slice_layer(factors_chunk, j)
            h_in = (jax.device_put(saved_chunk[j], self._s_dev)
                    if self.acts_on_host else saved_chunk[j])

            def f(faj, hh, wd=wd):
                return self._apply_block_lora(wd, faj, hh, it, mpm, mask)

            _, vjp = jax.vjp(f, fj, h_in)
            g_fj, g = vjp(g)
            g_layers[j] = g_fj
        return jax.tree.map(lambda *xs: jnp.stack(xs), *g_layers), g

    def _bwd_collect(self, hbs, factors, saved, it, g):
        """Chunked backward walk (Python loop over jitted chunk graphs;
        the cotangent chains the dispatches so they serialise naturally).
        Returns stacked factor grads in the layout of lora['factors']."""
        n = len(hbs)
        gsz = self.bwd_chunk
        chunks = []
        for k0 in range(((n - 1) // gsz) * gsz, -1, -gsz):
            k1 = min(k0 + gsz, n)
            fch = (self._slice_factor_chunk(factors, k0)
                   if k1 - k0 == gsz else
                   {p: {"down": f["down"][k0:k1], "up": f["up"][k0:k1]}
                    for p, f in factors.items()})
            g_fch, g = self._bwd_chunk_fn(hbs[k0:k1], fch, saved[k0:k1],
                                          it, g)
            # scalar fence (block_until_ready is a no-op on pending work
            # in this relay): >10 queued 200-arg streamed dispatches
            # degrade it (offload.py measurement)
            float(g[(0,) * g.ndim])
            chunks.append(g_fch)
        chunks.reverse()
        if len(chunks) == 1:
            return chunks[0]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                            *chunks)

    @functools.partial(jax.jit, static_argnums=(0,),
                       donate_argnums=(1, 3))
    def _update(self, factors, g_factors, opt_state):
        gf, _ = optax.clip_by_global_norm(self.max_grad_norm).update(
            g_factors, optax.EmptyState())
        updates, opt_state = self.tx.update(gf, opt_state, factors)
        factors = optax.apply_updates(factors, updates)
        return factors, opt_state

    # ------------------------------------------------------------------ #

    def train_step(self, lora: Any, opt_state, batch: dict, rng, rank=0,
                   fence: bool = True):
        """One LoRA train step. Returns (lora, opt_state, metrics)."""
        zt, t, target, loss_weight = self._prep(batch["latents"], rng,
                                                jnp.asarray(rank, jnp.int32))
        it = self._embed(self.resident, zt, t, batch["context"],
                         batch.get("y"), batch.get("clip_fea"),
                         batch.get("mpm_features"))
        tokens, saved = self._fwd_collect(self.host_blocks, lora["factors"],
                                          it)
        loss, g_tok = self._loss_tail(self.resident, tokens, it, target,
                                      loss_weight)
        g_factors = self._bwd_collect(self.host_blocks, lora["factors"],
                                      saved, it, g_tok)
        factors, opt_state = self._update(lora["factors"], g_factors,
                                          opt_state)
        lora = {**lora, "factors": factors}
        if fence:
            # same per-step scalar fence as StreamedDiT.denoise: queued
            # multi-hundred-arg streamed dispatches degrade the PJRT relay
            loss = jnp.float32(float(loss))
        return lora, opt_state, {"loss": loss}


def make_streamed_lora_trainer(model, params, tx, rng, rank: int = 4,
                               alpha: float = 1.0, multiplier: float = 1.0,
                               quantize: str = "fp8", targets=None,
                               skip_name: Optional[str] = None,
                               rope_tables=None, **train_kw):
    """Convenience: split a full param tree, park blocks on the host,
    create the LoRA factor tree, return (trainer, lora, opt_state)."""
    from ..parallel.offload import offload_blocks_to_host, split_block_params
    from .lora import DEFAULT_TARGETS, create_lora

    lora = create_lora(params, rng, rank=rank, alpha=alpha,
                       targets=targets or DEFAULT_TARGETS,
                       skip_name=skip_name)
    resident, stacked = split_block_params(params)
    host = offload_blocks_to_host(stacked, model.cfg.num_layers,
                                  quantize=quantize)
    trainer = StreamedLoRATrainer(
        model, resident, host, tx, lora_rank=rank, lora_alpha=alpha,
        lora_multiplier=multiplier,
        rel2full=lora_block_paths(lora["factors"]),
        rope_tables=rope_tables, **train_kw)
    opt_state = tx.init(lora["factors"])
    return trainer, lora, opt_state

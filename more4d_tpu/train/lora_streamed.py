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
from .sampler import StratifiedTimestepSampler
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
                 rope_tables=None):
        super().__init__(model, resident, host_blocks,
                         rope_tables=rope_tables)
        self.tx = tx
        self.scale = float(lora_multiplier * lora_alpha / lora_rank)
        self.rel2full = rel2full or {}
        self.max_grad_norm = float(max_grad_norm)
        self.mse_threshold = float(mse_threshold)
        self.sigmas = jnp.asarray(
            training_schedule(num_train_timesteps, shift))
        self.sampler = StratifiedTimestepSampler(
            num_train_timesteps, uniform_sampling=uniform_sampling,
            world_size=world_size)

    # ------------------------------------------------------------------ #

    def _merge_block(self, w_tree, factors_k):
        """One layer's merged weights: W + scale * down @ up on matched
        kernels — the same formula as train/lora.py apply_lora (delta cast
        to the base dtype first, so bf16 runtime matches merge-at-load)."""

        def walk(tree, prefix=""):
            if isinstance(tree, dict):
                return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                        for k, v in tree.items()}
            full = self.rel2full.get(prefix)
            if full is None or full not in factors_k:
                return tree
            f = factors_k[full]
            delta = jnp.matmul(f["down"], f["up"]).astype(tree.dtype)
            return tree + self.scale * delta

        return walk(w_tree)

    def _slice_layer(self, factors, k):
        return {p: {"down": f["down"][k], "up": f["up"][k]}
                for p, f in factors.items()}

    def _block_args(self, it):
        mpm, mask = it.mpm_tokens, it.mpm_mask
        if mpm is None and self.cfg.motion_guidance:
            mpm = jnp.zeros(it.tokens.shape[:2]
                            + (self.cfg.motion_feature_dim,), self.cfg.dtype)
            mask = jnp.zeros((it.tokens.shape[1], 1), jnp.float32)
        return mpm, mask

    @functools.partial(jax.jit, static_argnums=(0,))
    def _prep(self, latents, rng, rank):
        """Noising + target, bit-matching make_vism_train_step's prep."""
        rng_t, rng_n = jax.random.split(rng)
        x = latents.astype(jnp.float32)
        b = x.shape[0]
        idx = self.sampler(rng_t, b, rank)
        sigma = self.sigmas[idx].reshape(b, 1, 1, 1, 1)
        t = (self.sigmas[idx] * 1000.0).astype(jnp.float32)
        noise = jax.random.normal(rng_n, x.shape, jnp.float32)
        zt = (1.0 - sigma) * x + sigma * noise
        target = noise - x
        return zt, t, target

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fwd_collect(self, hbs, factors, it):
        """Forward walk; returns (tokens_out, stacked per-block inputs).
        ONE graph: XLA overlaps block k+1's host->HBM copy with block k's
        compute and frees each block's weight buffers after use."""
        mpm, mask = self._block_args(it)
        h = it.tokens
        saved = []
        for k, w in enumerate(hbs):
            saved.append(h)
            wd = self._dequant(jax.device_put(w, self._s_dev))
            merged = self._merge_block(wd, self._slice_layer(factors, k))
            h = self._block.apply({"params": merged}, h, it.e0, it.context,
                                  it.rope_cos, it.rope_sin, it.kv_lens,
                                  mpm, mask)
        return h, jnp.stack(saved)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _loss_tail(self, resident, tokens, it, target):
        from ..models.wan_dit import WanDiT

        def lf(tok):
            pred = self.model.apply(resident, tok, it,
                                    method=WanDiT.finalize)
            return custom_mse_loss(pred, target,
                                   threshold=self.mse_threshold)

        return jax.value_and_grad(lf)(tokens)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _bwd_collect(self, hbs, factors, saved, it, g):
        """Backward walk: per block (reverse order) re-stream the weights,
        recompute the block forward inside jax.vjp, and pull gradients to
        (layer-k LoRA factors, block input). Returns stacked factor grads
        in the layout of ``lora['factors']``."""
        mpm, mask = self._block_args(it)
        g_layers = [None] * len(hbs)
        for k in reversed(range(len(hbs))):
            wd = self._dequant(jax.device_put(hbs[k], self._s_dev))
            fk = self._slice_layer(factors, k)

            def f(fak, hh, wd=wd):
                merged = self._merge_block(wd, fak)
                return self._block.apply({"params": merged}, hh, it.e0,
                                         it.context, it.rope_cos,
                                         it.rope_sin, it.kv_lens, mpm, mask)

            _, vjp = jax.vjp(f, fk, saved[k])
            g_fk, g = vjp(g)
            g_layers[k] = g_fk
        return jax.tree.map(lambda *xs: jnp.stack(xs), *g_layers)

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
        zt, t, target = self._prep(batch["latents"], rng,
                                   jnp.asarray(rank, jnp.int32))
        it = self._embed(self.resident, zt, t, batch["context"],
                         batch.get("y"), batch.get("clip_fea"),
                         batch.get("mpm_features"))
        tokens, saved = self._fwd_collect(self.host_blocks, lora["factors"],
                                          it)
        loss, g_tok = self._loss_tail(self.resident, tokens, it, target)
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
                               rope_tables=None, **train_kw):
    """Convenience: split a full param tree, park blocks on the host,
    create the LoRA factor tree, return (trainer, lora, opt_state)."""
    from ..parallel.offload import offload_blocks_to_host, split_block_params
    from .lora import DEFAULT_TARGETS, create_lora

    lora = create_lora(params, rng, rank=rank, alpha=alpha,
                       targets=targets or DEFAULT_TARGETS)
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

"""4D-ViSM trainer: LoRA fine-tune of the Wan-Fun-InP inpainting DiT.

Re-implements scripts/4D_ViSM_training/train.py: only the LoRA factors train
(create_network + apply_to, :859-868; rank 4, lr 1e-4); conditioning is
``y = [4ch folded mask latents | masked-video latents]`` mirroring the
inpaint pipeline (:1634-1651); 10% of samples drop the inpaint conditioning
to zeros (t2v_flag dropout, :1600-1605, applied in data prep); loss is the
same flow-matching MSE (:1734-1779) with the optional motion_sub term
(:1775-1779) and SD3 loss weighting (:1771); timesteps come from the
rank-stratified sampler or, with uniform_sampling=False, the SD3 density
sampler (:1706-1712).

Text-encoder LoRA (reference --train_text_encoder, :868 ``network.apply_to
(text_encoder, transformer3d, True, True)``): pass ``text_encoder`` /
``te_params`` and batches carrying ``input_ids`` — the umT5 tower is then
applied INSIDE the loss with its own LoRA factors merged (targets = the
Linears of T5SelfAttention/T5FeedForward, lora_utils.py:160), so gradients
reach both factor trees.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models.wan_dit import WanDiT
from .lora import apply_lora
from .optim import custom_mse_loss, motion_sub_loss
from .sampler import (StratifiedTimestepSampler, loss_weighting_sd3,
                      timestep_density_u)
from .train_straag import training_schedule

# the Linears inside T5SelfAttention (q/k/v/o) and T5FeedForward
# (gate/fc1/fc2) — the JAX analog of TEXT_ENCODER_TARGET_REPLACE_MODULE
TE_LORA_TARGETS = r"blocks.*/(attn|ffn)/.*kernel$"


@dataclasses.dataclass(frozen=True)
class VismTrainConfig:
    learning_rate: float = 1e-4
    max_grad_norm: float = 1.0
    mse_threshold: float = 50.0
    shift: float = 5.0
    num_train_timesteps: int = 1000
    uniform_sampling: bool = True
    # SD3 density sampling + loss weighting (train.py:1706-1712, :1771)
    weighting_scheme: str = "none"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    # motion_sub temporal-difference loss term (train.py:1775-1779; the
    # reference literally diffs dim 1 of [B,C,F,H,W] = latent CHANNELS —
    # we diff frames, the behavior the name/guard describe, see
    # optim.motion_sub_loss)
    motion_sub_loss: bool = False
    motion_sub_loss_ratio: float = 0.25
    world_size: int = 1
    lora_multiplier: float = 1.0


def make_vism_train_step(dit: WanDiT, tx: optax.GradientTransformation,
                         cfg: VismTrainConfig,
                         text_encoder=None):
    """Returns step(lora, opt_state, base_params, batch, rng, rank) —
    gradients flow only into the LoRA factor tree(s).

    Without ``text_encoder``: batch carries precomputed 'context' and
    ``lora`` is the DiT factor tree. With it (--train_text_encoder):
    ``lora`` = {'dit': <dit lora>, 'te': <t5 lora>}, ``base_params`` =
    {'dit': ..., 'te': ...}, and batch carries 'input_ids' (+ optional
    'attention_mask') which the LoRA-merged T5 encodes inside the loss."""
    sigmas = jnp.asarray(training_schedule(cfg.num_train_timesteps,
                                           cfg.shift))
    sampler = StratifiedTimestepSampler(
        cfg.num_train_timesteps, uniform_sampling=cfg.uniform_sampling,
        world_size=cfg.world_size)

    def step(lora, opt_state, base_params, batch, rng, rank=0):
        rng_t, rng_n = jax.random.split(rng)
        x = batch["latents"].astype(jnp.float32)
        b = x.shape[0]
        if cfg.uniform_sampling:
            idx = sampler(rng_t, b, rank)
        else:
            u = timestep_density_u(rng_t, cfg.weighting_scheme, b,
                                   cfg.logit_mean, cfg.logit_std,
                                   cfg.mode_scale)
            idx = jnp.clip((u * cfg.num_train_timesteps).astype(jnp.int32),
                           0, cfg.num_train_timesteps - 1)
        sigma = sigmas[idx].reshape(b, 1, 1, 1, 1)
        t = (sigmas[idx] * 1000.0).astype(jnp.float32)
        loss_weight = loss_weighting_sd3(cfg.weighting_scheme, sigma)
        noise = jax.random.normal(rng_n, x.shape, jnp.float32)
        zt = (1.0 - sigma) * x + sigma * noise
        target = noise - x

        if text_encoder is not None:
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            base_params["dit"])
            frozen_te = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                               base_params["te"])
            factor_trees = {"dit": lora["dit"]["factors"],
                            "te": lora["te"]["factors"]}
        else:
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            base_params)
            factor_trees = lora["factors"]

        def loss_fn(factors):
            if text_encoder is not None:
                merged = apply_lora(frozen,
                                    {**lora["dit"],
                                     "factors": factors["dit"]},
                                    cfg.lora_multiplier)
                merged_te = apply_lora(frozen_te,
                                       {**lora["te"],
                                        "factors": factors["te"]},
                                       cfg.lora_multiplier)
                mask = batch.get("attention_mask")
                context = text_encoder.apply(
                    merged_te, batch["input_ids"],
                    mask).astype(jnp.float32)
                if mask is not None:
                    # zero padded positions (the reference truncates
                    # prompt_embeds to seq_lens, train.py:1694-1696)
                    context = context * mask[..., None].astype(jnp.float32)
            else:
                merged = apply_lora(frozen, {**lora, "factors": factors},
                                    cfg.lora_multiplier)
                context = batch["context"]
            pred = dit.apply(merged, zt, t, context,
                             y=batch["y"], clip_fea=batch.get("clip_fea"))
            loss = custom_mse_loss(pred, target, weighting=loss_weight,
                                   threshold=cfg.mse_threshold)
            if cfg.motion_sub_loss and pred.shape[1] > 2:
                sub = motion_sub_loss(pred, target)
                loss = loss * (1 - cfg.motion_sub_loss_ratio) \
                    + sub * cfg.motion_sub_loss_ratio
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(factor_trees)
        gf, _ = optax.clip_by_global_norm(cfg.max_grad_norm).update(
            grads, optax.EmptyState())
        updates, opt_state = tx.update(gf, opt_state, factor_trees)
        factors = optax.apply_updates(factor_trees, updates)
        if text_encoder is not None:
            lora = {"dit": {**lora["dit"], "factors": factors["dit"]},
                    "te": {**lora["te"], "factors": factors["te"]}}
        else:
            lora = {**lora, "factors": factors}
        return lora, opt_state, {"loss": loss}

    return step

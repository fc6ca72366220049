"""4D-ViSM trainer: LoRA fine-tune of the Wan-Fun-InP inpainting DiT.

Re-implements scripts/4D_ViSM_training/train.py: only the LoRA factors train
(create_network + apply_to, :859-868; rank 4, lr 1e-4); conditioning is
``y = [4ch folded mask latents | masked-video latents]`` mirroring the
inpaint pipeline (:1634-1651); 10% of samples drop the inpaint conditioning
to zeros (t2v_flag dropout, :1600-1605, applied in data prep); loss is the
same flow-matching MSE (:1734-1779).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ..models.wan_dit import WanDiT
from .lora import apply_lora
from .optim import custom_mse_loss
from .sampler import StratifiedTimestepSampler
from .train_straag import training_schedule


@dataclasses.dataclass(frozen=True)
class VismTrainConfig:
    learning_rate: float = 1e-4
    max_grad_norm: float = 1.0
    mse_threshold: float = 50.0
    shift: float = 5.0
    num_train_timesteps: int = 1000
    uniform_sampling: bool = True
    world_size: int = 1
    lora_multiplier: float = 1.0


def make_vism_train_step(dit: WanDiT, tx: optax.GradientTransformation,
                         cfg: VismTrainConfig):
    """Returns step(lora, opt_state, base_params, batch, rng, rank) —
    gradients flow only into the LoRA factor tree."""
    sigmas = jnp.asarray(training_schedule(cfg.num_train_timesteps,
                                           cfg.shift))
    sampler = StratifiedTimestepSampler(
        cfg.num_train_timesteps, uniform_sampling=cfg.uniform_sampling,
        world_size=cfg.world_size)

    def step(lora, opt_state, base_params, batch, rng, rank=0):
        rng_t, rng_n = jax.random.split(rng)
        x = batch["latents"].astype(jnp.float32)
        b = x.shape[0]
        idx = sampler(rng_t, b, rank)
        sigma = sigmas[idx].reshape(b, 1, 1, 1, 1)
        t = (sigmas[idx] * 1000.0).astype(jnp.float32)
        noise = jax.random.normal(rng_n, x.shape, jnp.float32)
        zt = (1.0 - sigma) * x + sigma * noise
        target = noise - x

        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)

        def loss_fn(factors):
            merged = apply_lora(frozen, {**lora, "factors": factors},
                                cfg.lora_multiplier)
            pred = dit.apply(merged, zt, t, batch["context"],
                             y=batch["y"], clip_fea=batch.get("clip_fea"))
            return custom_mse_loss(pred, target,
                                   threshold=cfg.mse_threshold)

        loss, grads = jax.value_and_grad(loss_fn)(lora["factors"])
        gf, _ = optax.clip_by_global_norm(cfg.max_grad_norm).update(
            grads, optax.EmptyState())
        updates, opt_state = tx.update(gf, opt_state, lora["factors"])
        factors = optax.apply_updates(lora["factors"], updates)
        lora = {**lora, "factors": factors}
        return lora, opt_state, {"loss": loss}

    return step

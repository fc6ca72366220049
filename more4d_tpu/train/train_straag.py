"""4D-STraG trainer: full fine-tune of the 4D DiT on trajectory latents.

Re-implements the training semantics of scripts/4D_STraG_training/
train_wan.py (SURVEY.md §3.1) as one jitted step:

- flow-matching noise: zt = (1 - sigma) x + sigma eps, target = eps - x
  (:1922-1928), sigma indexed from the shifted training schedule by the
  (optionally rank-stratified) timestep sampler;
- thresholded MSE + optional motion_sub temporal-difference loss
  (:1952-1972);
- abnormal-loss skip: loss > 0.25 after step 50 drops the update (:1978-1985)
  — realised as lax.cond keeping params/opt_state;
- dynamic grad-norm clamp (:1991-2001) and EMA (:956).

The VAE encode of flow pixels into latents and the 2% control dropout
(:1756-1798) are data-preparation steps (see prepare_batch)."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.flow_match import shift_sigmas
from ..models.wan_dit import WanDiT
from .optim import (custom_mse_loss, dynamic_clip_norm, ema_update,
                    global_grad_norm, motion_sub_loss)
from .sampler import (StratifiedTimestepSampler, loss_weighting_sd3,
                      timestep_density_u)


def training_schedule(num_train_timesteps: int = 1000, shift: float = 5.0):
    """The FlowMatchEuler training sigmas (descending) with shift applied
    (diffusers default init; config scheduler_kwargs shift: 5.0)."""
    s = np.linspace(1.0, 1.0 / num_train_timesteps, num_train_timesteps)
    s = shift_sigmas(s, shift)
    return s.astype(np.float32)  # sigmas[i]; timesteps = sigmas * 1000


@dataclasses.dataclass(frozen=True)
class StraagTrainConfig:
    learning_rate: float = 2e-5
    max_grad_norm: float = 0.05
    abnormal_loss_threshold: float = 0.25
    abnormal_loss_start_step: int = 50
    grad_clip_decay_steps: int = 1000
    motion_sub_loss: bool = False
    motion_sub_loss_ratio: float = 0.25
    mse_threshold: float = 50.0
    shift: float = 5.0
    num_train_timesteps: int = 1000
    uniform_sampling: bool = True
    # SD3 density sampling + loss weighting (train_wan.py:1895-1902,1964):
    # when uniform_sampling is False, indices come from timestep_density_u
    # under this scheme; the loss weighting is applied in EITHER mode
    # (the reference computes it unconditionally; 'none' => ones)
    weighting_scheme: str = "none"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    world_size: int = 1
    ema_decay: float = 0.9999
    use_ema: bool = True
    # micro-batch gradient accumulation (reference
    # --gradient_accumulation_steps, train_wan.py via accelerate): the
    # optimizer applies the mean gradient every k-th step
    # (optax.MultiSteps wrap in the harness); loss guards and metrics
    # still run per micro-step, while the clip/abnormal schedules and
    # EMA count OPTIMIZER steps (reference sync_gradients semantics)
    grad_accum_steps: int = 1
    # when True the dynamic grad clamp lives inside the tx chain
    # (dynamic_clip_transform composed under MultiSteps, so it clips
    # the accumulated MEAN gradient once per optimizer step) and the
    # per-micro-step clamp in make_train_step is skipped
    clip_in_tx: bool = False


def make_train_step(dit: WanDiT, tx: optax.GradientTransformation,
                    cfg: StraagTrainConfig,
                    trainable_filter=None,
                    report_grad_norms: bool = False):
    """Returns step(params, opt_state, ema, batch, rng, global_step).

    batch: dict with 'latents' [B,T',h,w,16], 'y' [B,T',h,w,48],
    'context' [B,L,text_dim], optional 'clip_fea', 'mpm_features'.
    trainable_filter(path)->bool restricts which params get gradients
    (name-matched trainable_modules, train_wan.py:949-954); others are
    frozen via stop_gradient masking.
    report_grad_norms adds a per-parameter grad-norm dict to the step
    metrics (the reference's --report_model_info TensorBoard histograms,
    train_wan.py:2003-2012)."""
    sigmas = jnp.asarray(training_schedule(cfg.num_train_timesteps,
                                           cfg.shift))
    sampler = StratifiedTimestepSampler(
        cfg.num_train_timesteps, uniform_sampling=cfg.uniform_sampling,
        world_size=cfg.world_size)

    mask_tree = None

    def _trainable_mask(params):
        def walk(t, prefix=""):
            if isinstance(t, dict):
                return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                        for k, v in t.items()}
            return bool(trainable_filter(prefix)) if trainable_filter \
                else True
        return walk(params)

    def step(params, opt_state, ema, batch, rng, global_step, rank=0):
        nonlocal mask_tree
        if trainable_filter and mask_tree is None:
            mask_tree = _trainable_mask(params)

        rng_t, rng_n = jax.random.split(rng)
        x = batch["latents"].astype(jnp.float32)
        b = x.shape[0]
        if cfg.uniform_sampling:
            idx = sampler(rng_t, b, rank)
        else:
            # density path (train_wan.py:1895-1902): indices from the
            # SD3 sampling-density transform, no rank stratification
            u = timestep_density_u(rng_t, cfg.weighting_scheme, b,
                                   cfg.logit_mean, cfg.logit_std,
                                   cfg.mode_scale)
            idx = jnp.clip((u * cfg.num_train_timesteps).astype(jnp.int32),
                           0, cfg.num_train_timesteps - 1)
        sigma = sigmas[idx].reshape(b, 1, 1, 1, 1)
        t = (sigmas[idx] * 1000.0).astype(jnp.float32)
        loss_weight = loss_weighting_sd3(cfg.weighting_scheme,
                                         sigma)
        noise = jax.random.normal(rng_n, x.shape, jnp.float32)
        zt = (1.0 - sigma) * x + sigma * noise
        target = noise - x

        def loss_fn(p):
            if trainable_filter:
                p = jax.tree_util.tree_map(
                    lambda v, m: v if m else jax.lax.stop_gradient(v),
                    p, mask_tree)
            pred = dit.apply(p, zt, t, batch["context"], y=batch["y"],
                             y_camera=batch.get("y_camera"),
                             clip_fea=batch.get("clip_fea"),
                             mpm_features=batch.get("mpm_features"),
                             # --add_full_ref_image_in_self_attention
                             # (train_wan.py:1816-1836,1948): first-frame
                             # ref latents prepended as ref_conv tokens —
                             # a no-op unless the DiT config enables
                             # ref_conv, exactly like the reference
                             # (its shipped 4D config leaves add_ref_conv
                             # False, so :1948 passes into None)
                             full_ref=batch.get("full_ref"))
            loss = custom_mse_loss(pred, target, weighting=loss_weight,
                                   threshold=cfg.mse_threshold)
            if cfg.motion_sub_loss:
                sub = motion_sub_loss(pred, target)
                loss = loss * (1 - cfg.motion_sub_loss_ratio) \
                    + sub * cfg.motion_sub_loss_ratio
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # schedules count OPTIMIZER steps: with gradient accumulation the
        # harness still passes the micro-step counter here
        sched_step = global_step // max(cfg.grad_accum_steps, 1)
        if cfg.clip_in_tx:
            # accumulation mode: the clamp runs inside the tx chain on
            # the averaged gradient; report the raw micro-grad norm
            gnorm = global_grad_norm(grads)
        else:
            grads, gnorm, used_max = dynamic_clip_norm(
                grads, sched_step, cfg.max_grad_norm,
                decay_steps=cfg.grad_clip_decay_steps)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        if trainable_filter:
            # frozen params are never handed to the reference's optimizer,
            # so they see no weight decay either — zero their updates
            updates = jax.tree_util.tree_map(
                lambda u, m: u if m else jnp.zeros_like(u),
                updates, mask_tree)
        new_params = optax.apply_updates(params, updates)

        skip = jnp.logical_and(sched_step > cfg.abnormal_loss_start_step,
                               loss > cfg.abnormal_loss_threshold)
        skip = jnp.logical_or(skip, jnp.logical_not(jnp.isfinite(loss)))
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new), new_params, params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(skip, old, new)
            if hasattr(new, "shape") else new, new_opt_state, opt_state)

        if ema is not None:
            new_ema = ema_update(ema, params, cfg.ema_decay)
            # gradient accumulation: EMA moves only when the MultiSteps
            # window closes (params changed) — the reference updates EMA
            # once per sync step (train_wan.py:956), not per micro-batch.
            # mini_step resets to 0 on the window-closing update.
            ms = getattr(new_opt_state, "mini_step", None)
            if ms is not None:
                new_ema = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ms == 0, n, o), new_ema, ema)
            ema = jax.tree_util.tree_map(
                lambda new, old: jnp.where(skip, old, new), new_ema, ema)
        metrics = {"loss": loss, "grad_norm": gnorm, "skipped": skip}
        if report_grad_norms:
            flat, _ = jax.tree_util.tree_flatten_with_path(grads)
            metrics["grad_norms"] = {
                jax.tree_util.keystr(kp):
                    jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
                for kp, g in flat}
        return params, opt_state, ema, metrics

    return step


def should_skip_update(loss: float, global_step: int,
                       cfg: StraagTrainConfig) -> bool:
    """Host-side abnormal-loss batch skip for the split train step — the
    reference's own semantics (train_wan.py: the skip decision is made on
    the host before optimizer.step).  The fused make_train_step instead
    folds the same rule into the graph as a where-select, which is correct
    but forces OLD params/opt to stay alive as operands of the select —
    that alone is ~8 GiB at 1.3B+AdamW and is why the split path keeps the
    rule on the host (full buffer donation in update_fn)."""
    sched_step = global_step // max(cfg.grad_accum_steps, 1)
    if not math.isfinite(loss):
        return True
    return bool(sched_step > cfg.abnormal_loss_start_step
                and loss > cfg.abnormal_loss_threshold)


def make_split_train_step(dit: WanDiT, tx: optax.GradientTransformation,
                          cfg: StraagTrainConfig,
                          trainable_filter=None,
                          report_grad_norms: bool = False):
    """make_train_step's semantics as TWO separately-jitted stages:

        grad_fn(params, batch, rng, global_step) -> (loss, grads)
        update_fn(params, opt_state, ema, grads, global_step)
            -> (params, opt_state, ema, metrics)
               [opt_state/ema/grads donated; metrics: grad_norm(, norms)]

    The caller applies the abnormal-loss skip on the HOST (via
    should_skip_update) by simply not calling update_fn — matching the
    reference's host-side skip and keeping update_fn free of the
    old-vs-new where-select.

    Purpose: this environment's TPU relay server-side compiler crashes
    (HTTP 500, tpu_compile_helper exit 1) when a named-save remat policy
    ('flash'/'flash_lite', wan_dit.remat_policy_of) and the AdamW update
    share ONE compiled module at the 30-block scale, while the identical
    policy'd value_and_grad compiles standalone (round-4 bisect).
    Splitting sidesteps the crash for one extra dispatch plus the host
    loss readback between the two stages (which the skip rule needs
    anyway).  Numerics match the fused step
    (test_train.py::test_split_train_step_matches_fused)."""
    sigmas = jnp.asarray(training_schedule(cfg.num_train_timesteps,
                                           cfg.shift))
    sampler = StratifiedTimestepSampler(
        cfg.num_train_timesteps, uniform_sampling=cfg.uniform_sampling,
        world_size=cfg.world_size)
    mask_tree = None

    def _trainable_mask(params):
        def walk(t, prefix=""):
            if isinstance(t, dict):
                return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                        for k, v in t.items()}
            return bool(trainable_filter(prefix))
        return walk(params)

    def grad_fn(params, batch, rng, global_step, rank=0):
        nonlocal mask_tree
        if trainable_filter and mask_tree is None:
            mask_tree = _trainable_mask(params)
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

        def loss_fn(p):
            if trainable_filter:
                p = jax.tree_util.tree_map(
                    lambda v, m: v if m else jax.lax.stop_gradient(v),
                    p, mask_tree)
            pred = dit.apply(p, zt, t, batch["context"], y=batch["y"],
                             y_camera=batch.get("y_camera"),
                             clip_fea=batch.get("clip_fea"),
                             mpm_features=batch.get("mpm_features"),
                             full_ref=batch.get("full_ref"))
            loss = custom_mse_loss(pred, target, weighting=loss_weight,
                                   threshold=cfg.mse_threshold)
            if cfg.motion_sub_loss:
                sub = motion_sub_loss(pred, target)
                loss = loss * (1 - cfg.motion_sub_loss_ratio) \
                    + sub * cfg.motion_sub_loss_ratio
            return loss

        return jax.value_and_grad(loss_fn)(params)

    def update_fn(params, opt_state, ema, grads, global_step):
        nonlocal mask_tree
        if trainable_filter and mask_tree is None:
            mask_tree = _trainable_mask(params)
        sched_step = global_step // max(cfg.grad_accum_steps, 1)
        if cfg.clip_in_tx:
            gnorm = global_grad_norm(grads)
        else:
            grads, gnorm, _ = dynamic_clip_norm(
                grads, sched_step, cfg.max_grad_norm,
                decay_steps=cfg.grad_clip_decay_steps)
        updates, opt_state = tx.update(grads, opt_state, params)
        if trainable_filter:
            updates = jax.tree_util.tree_map(
                lambda u, m: u if m else jnp.zeros_like(u),
                updates, mask_tree)
        params = optax.apply_updates(params, updates)
        if ema is not None:
            new_ema = ema_update(ema, params, cfg.ema_decay)
            ms = getattr(opt_state, "mini_step", None)
            if ms is not None:
                new_ema = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ms == 0, n, o), new_ema, ema)
            ema = new_ema
        metrics = {"grad_norm": gnorm}
        if report_grad_norms:
            flat, _ = jax.tree_util.tree_flatten_with_path(grads)
            metrics["grad_norms"] = {
                jax.tree_util.keystr(kp):
                    jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
                for kp, g in flat}
        return params, opt_state, ema, metrics

    # Donate opt_state + ema + grads but NOT params: inputs then donate
    # exactly as many param-tree-sized buffer sets (mu, nu[, ema], grads)
    # as there are outputs (params', mu', nu'[, ema']) — params' aliases
    # the grads buffer.  Donating params too (one more donated set than
    # outputs) leaves one donated set "not usable", and this relay's
    # allocator LEAKS it: measured round 4, step 0 succeeds and step 1
    # RESOURCE_EXHAUSTs with ANY remat policy, exactly a ~2.8 GiB/step
    # leak at 1.3B.  params is an operand of the AdamW math regardless,
    # so excluding it costs nothing.
    return (jax.jit(grad_fn),
            jax.jit(update_fn, donate_argnums=(1, 2, 3)))

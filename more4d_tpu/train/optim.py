"""Optimizer + training-robustness utilities.

Re-implements the reference's training hardening (SURVEY.md §5):
- two-tier learning-rate AdamW (train_wan.py:1091-1142),
- EMA of trainable params (:956-965),
- dynamic gradient-norm clamping: the max norm decays linearly and shrinks up
  to 10x when the observed norm is anomalous (:1991-2001),
- thresholded MSE loss (custom_mse_loss, :1952-1962) and the temporal-
  difference motion_sub_loss (:1968-1972),
- windowed statistical loss-outlier skip (train_vae.py:35-106).
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def scale_lr(lr, ratio: float):
    """lr * ratio for a float OR an optax schedule callable."""
    if callable(lr):
        return lambda step: lr(step) * ratio
    return lr * ratio


def make_lr_schedule(lr: float, name: str = "constant",
                     warmup_steps: int = 0, total_steps: int = 10000):
    """The reference's diffusers get_scheduler analog
    (train_wan.py:306-315 --lr_scheduler/--lr_warmup_steps): returns a
    float (plain constant) or an optax schedule usable as any optimizer's
    learning_rate.  Supported: constant / constant_with_warmup / linear /
    cosine (the reference's useful subset; its default is constant).

    Steps are OPTIMIZER steps: under gradient accumulation the schedule
    advances once per accumulated update (optax.MultiSteps), so callers
    must pass total_steps in optimizer steps (micro_steps // accum).
    Like diffusers get_scheduler, plain 'constant' ignores warmup_steps."""
    if name == "constant":
        return lr
    if name == "constant_with_warmup":
        if warmup_steps <= 0:
            return lr
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.constant_schedule(lr)], [warmup_steps])
    decay = max(total_steps - warmup_steps, 1)
    if name == "linear":
        main = optax.linear_schedule(lr, 0.0, decay)
    elif name == "cosine":
        main = optax.cosine_decay_schedule(lr, decay)
    else:
        raise ValueError(f"unknown lr_scheduler '{name}'")
    if warmup_steps <= 0:
        return main
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps), main],
        [warmup_steps])


def with_low_lr(make_tx, lr, low_lr_names: str,
                low_lr_ratio: float, params):
    """Two-tier LR via optax.multi_transform: params whose path matches
    ``low_lr_names`` (regex) train at lr * low_lr_ratio, the rest at lr
    (train_wan.py:1091-1142). Works for any lr -> transform factory
    (AdamW, CAME, ...) and for schedule-valued lr."""
    assert params is not None
    pattern = re.compile(low_lr_names)

    def label(tree):
        def walk(t, prefix=""):
            if isinstance(t, dict):
                return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                        for k, v in t.items()}
            return "low" if pattern.search(prefix) else "high"
        return walk(tree)

    return optax.multi_transform(
        {"high": make_tx(lr), "low": make_tx(scale_lr(lr, low_lr_ratio))},
        label(params))


def make_adamw(lr, low_lr_names: Optional[str] = None,
               low_lr_ratio: float = 0.1, betas=(0.9, 0.999),
               weight_decay: float = 3e-2, eps: float = 1e-10,
               params=None):
    """AdamW with an optional low-LR parameter group selected by path regex
    (the reference trains e.g. newly-initialised modules at full LR and the
    backbone at a reduced LR; train_wan.py:1091-1142).  ``lr`` may be a
    float or an optax schedule (make_lr_schedule)."""
    mk = lambda lr_: optax.adamw(lr_, b1=betas[0], b2=betas[1], eps=eps,
                                 weight_decay=weight_decay)
    if low_lr_names is None:
        return mk(lr)
    return with_low_lr(mk, lr, low_lr_names, low_lr_ratio, params)


def ema_update(ema_params, params, decay: float = 0.9999):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def global_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def linear_decay(initial: float, final: float, total_steps: int, step):
    frac = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
    return initial + (final - initial) * frac


def dynamic_clip_norm(grads, step, max_grad_norm: float = 0.05,
                      initial_ratio: float = 5.0,
                      decay_steps: int = 1000):
    """Clip by a linearly-decaying max norm; if the observed norm exceeds it
    by >5x after the decay window, shrink the limit up to 10x
    (train_wan.py:1991-2001). Returns (clipped_grads, norm, used_max)."""
    norm = global_grad_norm(grads)
    max_norm = linear_decay(max_grad_norm * initial_ratio, max_grad_norm,
                            decay_steps, step)
    ratio = norm / jnp.maximum(max_norm, 1e-12)
    anomalous = jnp.logical_and(ratio > 5.0, step > decay_steps)
    used_max = jnp.where(anomalous, max_norm / jnp.minimum(ratio, 10.0),
                         max_norm)
    scale = jnp.minimum(1.0, used_max / jnp.maximum(norm, 1e-12))
    clipped = jax.tree_util.tree_map(
        lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads)
    return clipped, norm, used_max


class DynamicClipState(NamedTuple):
    count: jnp.ndarray  # optimizer steps seen (one per .update() call)


def dynamic_clip_transform(max_grad_norm: float = 0.05,
                           initial_ratio: float = 5.0,
                           decay_steps: int = 1000):
    """``dynamic_clip_norm`` as an optax GradientTransformation whose
    schedule counter advances once per ``.update()`` call. Composed
    INSIDE ``optax.MultiSteps`` it therefore clips the accumulated MEAN
    gradient exactly once per optimizer step — the reference's
    accelerate semantics (clipping under sync_gradients,
    train_wan.py:1991-2001) — and its decay schedule counts optimizer
    steps, not micro-steps."""
    def init_fn(params):
        del params
        return DynamicClipState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        clipped, _norm, _used = dynamic_clip_norm(
            updates, state.count, max_grad_norm, initial_ratio,
            decay_steps)
        return clipped, DynamicClipState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def custom_mse_loss(pred, target, weighting=None, threshold: float = 50.0):
    """MSE with |err| > threshold masked out (train_wan.py:1952-1962)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = pred - target
    loss = jnp.square(diff) * (jnp.abs(diff) <= threshold)
    if weighting is not None:
        loss = loss * weighting.astype(jnp.float32)
    return loss.mean()


def motion_sub_loss(pred, target):
    """Temporal-difference MSE on [B, T, ...] (train_wan.py:1968-1972)."""
    dp = pred[:, 1:].astype(jnp.float32) - pred[:, :-1].astype(jnp.float32)
    dt = target[:, 1:].astype(jnp.float32) \
        - target[:, :-1].astype(jnp.float32)
    return jnp.mean(jnp.square(dp - dt))


class LossOutlierTracker:
    """Host-side windowed loss-outlier detector (train_vae.py:35-106,
    should_skip_batch): skip a batch whose loss is non-finite, exceeds the
    absolute threshold, or exceeds the window statistic — mean + sigma*std
    normally, mean * multiplier when the window std is degenerate (<1e-6,
    the reference's early-training guard)."""

    def __init__(self, window: int = 100, sigma: float = 6.0,
                 warmup: int = 20, absolute_threshold: float = 1e7,
                 multiplier: float = 10.0):
        self.window = window
        self.sigma = sigma
        self.warmup = warmup
        self.absolute_threshold = absolute_threshold
        self.multiplier = multiplier
        self.values = []

    def should_skip(self, loss: float) -> bool:
        import math

        if not math.isfinite(loss):
            return True
        if loss > self.absolute_threshold:       # train_vae.py:82
            return True
        if len(self.values) >= self.warmup:
            import numpy as np

            mean = float(np.mean(self.values))
            std = float(np.std(self.values))
            threshold = (mean * self.multiplier if std < 1e-6
                         else mean + self.sigma * std)  # :93-97
            if loss > threshold:
                return True
        self.values.append(loss)
        if len(self.values) > self.window:
            self.values.pop(0)
        return False


# --------------------------------------------------------------------------
# CAME optimizer (Luo et al. 2023) — the reference's optional --use_came
# path (train_wan.py:1129-1136: betas (0.9, 0.999, 0.9999),
# eps (1e-30, 1e-16)). Adafactor-style factored second moments plus a
# confidence-guided (instability-factored) rescaling of the first moment.
# Memory: O(n) first moment + O(rows+cols) factored statistics.
# --------------------------------------------------------------------------


def _factored_dims(shape):
    return len(shape) >= 2


def _row_col_update(stat_r, stat_c, sq, beta):
    """EMA the row/col means of ``sq`` over the last two axes."""
    new_r = beta * stat_r + (1 - beta) * jnp.mean(sq, axis=-1)
    new_c = beta * stat_c + (1 - beta) * jnp.mean(sq, axis=-2)
    return new_r, new_c


def _factored_rsqrt(stat_r, stat_c):
    """Reconstruct 1/sqrt(v) from factored stats (Adafactor eq. 4)."""
    r = stat_r / jnp.maximum(
        jnp.mean(stat_r, axis=-1, keepdims=True), 1e-30)
    return jax.lax.rsqrt(
        jnp.maximum(r[..., None] * stat_c[..., None, :], 1e-30))


def came(learning_rate: float, betas=(0.9, 0.999, 0.9999),
         eps=(1e-30, 1e-16), weight_decay: float = 1e-2,
         clip_threshold: float = 1.0) -> optax.GradientTransformation:
    """CAME as an optax transformation.

    Per step (matrices factored over the last two dims, vectors full):
      u   = g / sqrt(EMA_b2[g^2] + eps1)
      u   = u / max(1, RMS(u)/clip_threshold)
      m   = b1 m + (1-b1) u
      r   = EMA_b3[(u - m)^2 + eps2]            (confidence / instability)
      upd = m / sqrt(r)                          (factored tensors only;
                                                  1-D tensors use upd = m,
                                                  as in official CAME)
    """
    b1, b2, b3 = betas
    eps1, eps2 = eps

    def init(params):
        def leaf(p):
            state = {"m": jnp.zeros_like(p)}
            if _factored_dims(p.shape):
                state["v_r"] = jnp.zeros(p.shape[:-1], p.dtype)
                state["v_c"] = jnp.zeros(p.shape[:-2] + p.shape[-1:],
                                         p.dtype)
                state["r_r"] = jnp.zeros(p.shape[:-1], p.dtype)
                state["r_c"] = jnp.zeros(p.shape[:-2] + p.shape[-1:],
                                         p.dtype)
            else:
                # official CAME keeps no instability stats for non-factored
                # (1-D) tensors — their update is the first moment directly
                state["v"] = jnp.zeros_like(p)
            return state

        return {"count": jnp.zeros((), jnp.int32),
                "leaves": jax.tree_util.tree_map(leaf, params)}

    def update(grads, state, params=None):
        assert params is not None, "came() needs params (weight decay)"
        count = state["count"] + 1
        # schedule-valued learning_rate (make_lr_schedule), like optax
        lr_t = (learning_rate(state["count"]) if callable(learning_rate)
                else learning_rate)

        def leaf(g, s, p):
            g = g.astype(jnp.float32)
            sq = g * g + eps1
            out = dict(s)
            if _factored_dims(g.shape):
                out["v_r"], out["v_c"] = _row_col_update(
                    s["v_r"], s["v_c"], sq, b2)
                u = g * _factored_rsqrt(out["v_r"], out["v_c"])
            else:
                out["v"] = b2 * s["v"] + (1 - b2) * sq
                u = g * jax.lax.rsqrt(jnp.maximum(out["v"], 1e-30))
            rms = jnp.sqrt(jnp.mean(u * u) + 1e-30)
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m = b1 * s["m"] + (1 - b1) * u
            out["m"] = m
            if _factored_dims(g.shape):
                inst = (u - m) ** 2 + eps2
                out["r_r"], out["r_c"] = _row_col_update(
                    s["r_r"], s["r_c"], inst, b3)
                upd = m * _factored_rsqrt(out["r_r"], out["r_c"])
            else:
                # non-factored branch of official CAME: update = exp_avg
                upd = m
            if weight_decay:
                upd = upd + weight_decay * p.astype(jnp.float32)
            return (-lr_t * upd).astype(g.dtype), out

        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        s_leaves = treedef.flatten_up_to(state["leaves"])
        p_leaves = treedef.flatten_up_to(params)
        pairs = [leaf(g, s, p)
                 for g, s, p in zip(g_leaves, s_leaves, p_leaves)]
        updates = jax.tree_util.tree_unflatten(
            treedef, [u for u, _ in pairs])
        leaves = jax.tree_util.tree_unflatten(
            treedef, [s for _, s in pairs])
        return updates, {"count": count, "leaves": leaves}

    return optax.GradientTransformation(init, update)

"""Rank-stratified timestep sampling.

Re-implements DiscreteSampling (MoRe4D/utils/discrete_sampler.py:5-52): the
world is partitioned into groups; each group samples timestep indices from
its own disjoint sigma interval, giving uniform coverage across the global
batch per step. Groups are keyed on the data-parallel mesh axis index (the
reference keys on torch.distributed rank with sp_size-aware grouping).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def timestep_density_u(rng, weighting_scheme: str, batch_size: int,
                       logit_mean: float = 0.0, logit_std: float = 1.0,
                       mode_scale: float = 1.29):
    """SD3 timestep-density sampling (the reference's non-uniform path,
    train_wan.py:1895-1902 via diffusers
    ``compute_density_for_timestep_sampling``): returns u [batch_size] in
    [0, 1); indices = floor(u * num_train_timesteps).

    - 'logit_normal': u = sigmoid(N(logit_mean, logit_std))
    - 'mode':         u ~ U[0,1); u <- 1 - u - mode_scale*(cos(pi u/2)^2 - 1 + u)
    - else ('none', 'sigma_sqrt', 'cosmap'): u ~ U[0,1)
    """
    if weighting_scheme == "logit_normal":
        u = jax.random.normal(rng, (batch_size,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    u = jax.random.uniform(rng, (batch_size,))
    if weighting_scheme == "mode":
        u = 1.0 - u - mode_scale * (
            jnp.cos(jnp.pi * u / 2.0) ** 2 - 1.0 + u)
    return u


def loss_weighting_sd3(weighting_scheme: str, sigmas):
    """SD3 per-sample loss weighting (train_wan.py:1964 via diffusers
    ``compute_loss_weighting_for_sd3``). Only 'sigma_sqrt' and 'cosmap'
    differ from ones; the reference applies this unconditionally with its
    default scheme 'none'."""
    sigmas = jnp.asarray(sigmas, jnp.float32)
    if weighting_scheme == "sigma_sqrt":
        return sigmas ** -2.0
    if weighting_scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


class StratifiedTimestepSampler:
    def __init__(self, num_idx: int, uniform_sampling: bool = True,
                 start_num_idx: int = 0, world_size: int = 1,
                 sp_size: int = 1):
        self.num_idx = num_idx
        self.start = start_num_idx
        self.uniform = uniform_sampling and world_size > 1

        if self.uniform:
            i = 1
            while True:
                if world_size % i != 0 or num_idx % (world_size // i) != 0:
                    i += 1
                    continue
                if i >= sp_size:
                    self.group_num = world_size // i
                elif sp_size > world_size:
                    self.group_num = 1
                else:
                    self.group_num = world_size // sp_size
                break
            assert self.group_num > 0
            self.group_width = world_size // self.group_num
            self.sigma_interval = self.num_idx // self.group_num
        else:
            self.group_num = 1
            self.group_width = max(world_size, 1)
            self.sigma_interval = num_idx

    def __call__(self, rng, n_samples: int, rank=0):
        """rank may be a traced scalar (e.g. lax.axis_index). Returns int32
        indices [n_samples]."""
        if not self.uniform:
            return jax.random.randint(rng, (n_samples,), self.start,
                                      self.start + self.num_idx)
        group = jnp.asarray(rank) // self.group_width
        lo = self.start + group * self.sigma_interval
        return lo + jax.random.randint(rng, (n_samples,), 0,
                                       self.sigma_interval)

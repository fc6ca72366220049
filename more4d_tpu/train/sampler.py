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

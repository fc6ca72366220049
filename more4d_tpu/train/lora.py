"""LoRA as a factored parameter pytree (kohya-style semantics).

Re-implements MoRe4D/utils/lora_utils.py for JAX: the reference injects
forward hooks on every Linear inside the transformer blocks
(LoRANetwork, :158-230; rank 4, alpha 1 by default, scale = alpha/rank,
effective W = W + multiplier * scale * up @ down). Here LoRA is a separate
pytree of {down, up} factors merged into the base params functionally —
gradients flow only through the factors, and ``apply_lora`` is also the
weight-merge used at inference (merge_lora, :368-447).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

# every Dense kernel inside the DiT blocks (self/cross attention + FFN),
# mirroring "all Linear children of WanAttentionBlock"
DEFAULT_TARGETS = r"blocks.*/(self_attn|cross_attn|ffn)/.*kernel$"


def _paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [("/".join(str(getattr(k, "key", k)) for k in path), leaf)
            for path, leaf in flat]


def create_lora(params, rng, rank: int = 4, alpha: float = 1.0,
                targets: str = DEFAULT_TARGETS,
                skip_name: Optional[str] = None):
    """Build the LoRA factor tree for all matching 2D kernels.

    down: [in, r] kaiming-uniform; up: [r, out] zeros (so LoRA starts as
    identity, lora_utils.py:96-100). ``skip_name`` drops any kernel whose
    path contains the substring (reference --lora_skip_name,
    lora_utils.py:205: ``skip_name in child_name``).
    """
    pattern = re.compile(targets)
    flat = {}
    keys = {}
    for path, leaf in _paths(params):
        # 2D = plain Dense kernel; 3D = [num_layers, in, out] (scanned blocks)
        if pattern.search(path) and hasattr(leaf, "ndim") \
                and leaf.ndim in (2, 3):
            if skip_name is not None and skip_name in path:
                continue
            keys[path] = leaf.shape
    rngs = jax.random.split(rng, max(len(keys), 1))
    for (path, shape), k in zip(sorted(keys.items()), rngs):
        fan_in = shape[-2]
        bound = float(np.sqrt(6.0 / fan_in))  # kaiming_uniform(a=sqrt(5))
        lead = shape[:-2]
        flat[path] = {
            "down": jax.random.uniform(k, lead + (shape[-2], rank),
                                       jnp.float32, -bound, bound),
            "up": jnp.zeros(lead + (rank, shape[-1]), jnp.float32),
        }
    return {"rank": rank, "alpha": alpha, "factors": flat}


def apply_lora(params, lora, multiplier: float = 1.0):
    """Merged params: W + multiplier * (alpha/rank) * down @ up."""
    scale = multiplier * lora["alpha"] / lora["rank"]
    factors = lora["factors"]

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if prefix in factors:
            f = factors[prefix]
            # @ broadcasts over the leading layer dim of scanned stacks
            delta = jnp.matmul(f["down"], f["up"]).astype(tree.dtype)
            return tree + scale * delta
        return tree

    return walk(params)


def lora_param_count(lora) -> int:
    return sum(int(np.prod(v.shape))
               for f in lora["factors"].values() for v in f.values())

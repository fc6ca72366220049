"""Ulysses-style sequence-parallel attention (the TPU rebuild of the
reference's missing ``MoRe4D.dist`` xFuser USP module; SURVEY.md §2.2/§2.4).

The reference chunks DiT tokens across ranks (wan_transformer4d.py:1187-1198),
monkey-patches self-attention with ``usp_attn_forward`` (all-to-all that
swaps the head and sequence dims) and all-gathers the output (:1320-1321).
Here the same dataflow is a ``shard_map`` around the attention call:

  [B, L/S, H, D] --all_to_all--> [B, L, H/S, D] --attn--> --all_to_all-->
  [B, L/S, H, D]

Collectives ride ICI; only self-attention needs communication (cross
attention context is replicated, matching the reference which leaves it
local).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import AXIS_SEQ

_ACTIVE_MESH: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]):
    """Install a process-wide mesh used by sequence-parallel attention."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def seq_parallel_size() -> int:
    if _ACTIVE_MESH is None:
        return 1
    return _ACTIVE_MESH.shape.get(AXIS_SEQ, 1)


def ulysses_attention(attn_fn, q, k, v, kv_lens=None,
                      mesh: Optional[Mesh] = None,
                      axis: str = AXIS_SEQ):
    """Run ``attn_fn(q, k, v, kv_lens)`` with sequence-sharded inputs.

    q/k/v: [B, L, H, D] logically global; sharded on L over ``axis``.
    Requires H % axis_size == 0.
    """
    mesh = mesh or _ACTIVE_MESH
    size = mesh.shape[axis]
    if size == 1:
        return attn_fn(q, k, v, kv_lens)

    def local(qc, kc, vc, lens):
        # [B, L/S, H, D] -> [B, L, H/S, D]
        a2a = partial(jax.lax.all_to_all, axis_name=axis, tiled=True)
        qg = a2a(qc, split_axis=2, concat_axis=1)
        kg = a2a(kc, split_axis=2, concat_axis=1)
        vg = a2a(vc, split_axis=2, concat_axis=1)
        out = attn_fn(qg, kg, vg, lens)
        return a2a(out, split_axis=1, concat_axis=2)

    spec = P(None, axis, None, None)
    lens_spec = P() if kv_lens is not None else None
    try:
        from jax import shard_map  # jax >= 0.8
        rep_kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    if kv_lens is None:
        fn = shard_map(lambda a, b, c: local(a, b, c, None), mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       **rep_kw)
        return fn(q, k, v)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec, lens_spec),
                   out_specs=spec, **rep_kw)
    return fn(q, k, v, kv_lens)

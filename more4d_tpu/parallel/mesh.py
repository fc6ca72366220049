"""Device mesh + sharding rules — the TPU replacement for the reference's
entire distributed runtime (accelerate/DeepSpeed ZeRO, torch FSDP, and the
missing ``MoRe4D.dist`` xFuser Ulysses module; SURVEY.md §2.2).

One mechanism covers the reference's whole parallelism matrix:

- ``dcn`` axis   — LEADING axis for multi-slice pods: pure data
  parallelism whose collectives ride the (slow) data-center network.
  Batches shard over (dcn, data) jointly; parameters NEVER shard over
  dcn, so the fsdp all-gathers/reduce-scatters stay on ICI within each
  slice (the multi-node DeepSpeed analog, train_wan.sh NCCL env).
- ``data`` axis  — data parallelism (DDP; grad all-reduce via XLA psum).
- ``fsdp`` axis  — parameter/optimizer sharding (ZeRO-3 / FULL_SHARD analog):
  every large parameter is sharded over this axis with NamedSharding; XLA
  inserts all-gathers on use and reduce-scatters on the grad path over ICI.
- ``seq`` axis   — sequence parallelism for long-token inference (the
  reference's Ulysses USP hooks, wan_transformer4d.py:1187-1198, 1320-1321).

Parameters get sharded by a simple, robust rule: take each >=1D tensor and
shard its largest dimension that is divisible by the fsdp axis size. This is
the NamedSharding equivalent of ZeRO-3's flat partitioning, but keeps XLA
layouts natural.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DCN = "dcn"
AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_SEQ = "seq"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1     # -1: absorb all remaining devices
    seq: int = 1
    dcn: int = 1       # slices (multi-slice pods): leading, DP-only axis

    def resolve(self, n_devices: int) -> "MeshConfig":
        known = [v for v in (self.data, self.fsdp, self.seq, self.dcn)
                 if v != -1]
        prod = int(np.prod(known)) if known else 1
        missing = n_devices // max(prod, 1)
        fix = lambda v: missing if v == -1 else v  # noqa: E731
        out = MeshConfig(fix(self.data), fix(self.fsdp), fix(self.seq),
                         fix(self.dcn))
        assert out.dcn * out.data * out.fsdp * out.seq == n_devices, (
            f"mesh {out} != {n_devices} devices")
        return out


def parse_mesh_spec(spec: Optional[str]) -> Optional[MeshConfig]:
    """CLI mesh topology: 'data=2,fsdp=4' or 'dcn=2,data=1,fsdp=4'
    (unnamed axes default; -1 absorbs the remaining devices). None/''
    keeps the MeshConfig defaults (all devices on the fsdp axis)."""
    if not spec:
        return None
    kw = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in ("data", "fsdp", "seq", "dcn"):
            raise ValueError(f"unknown mesh axis {k!r} "
                             "(expected dcn/data/fsdp/seq)")
        kw[k] = int(v)
    return MeshConfig(**kw)


def create_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    config = (config or MeshConfig()).resolve(len(devices))
    if config.dcn > 1:
        # leading dcn axis must align with physical slice boundaries so
        # every other axis's collectives stay on intra-slice ICI
        devices = sorted(devices, key=lambda d:
                         (getattr(d, "slice_index", 0) or 0, d.id))
    dev_array = np.asarray(devices).reshape(config.dcn, config.data,
                                            config.fsdp, config.seq)
    return Mesh(dev_array, (AXIS_DCN, AXIS_DATA, AXIS_FSDP, AXIS_SEQ))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the (dcn, data) axes jointly —
    on a multi-slice mesh each slice sees its own batch shard and the
    only cross-slice traffic is the gradient all-reduce over dcn."""
    batch_axes = (AXIS_DCN, AXIS_DATA) if AXIS_DCN in mesh.shape \
        else AXIS_DATA
    return NamedSharding(mesh, P(batch_axes, *(None,) * (ndim - 1)))


def _fsdp_spec(shape, fsdp_size: int, min_size: int) -> P:
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # shard the largest divisible dim; ties -> later dim (better for MXU
    # layouts where trailing dims are the lanes)
    best, best_size = None, 0
    for i, s in enumerate(shape):
        if s % fsdp_size == 0 and s >= best_size:
            best, best_size = i, s
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = AXIS_FSDP
    return P(*spec)


def fsdp_sharding(params: Any, mesh: Mesh,
                  min_size: int = 2 ** 16) -> Any:
    """NamedSharding tree for a parameter pytree (ZeRO-3 analog).

    Tensors smaller than ``min_size`` elements stay replicated — sharding tiny
    tensors costs more in collective latency than it saves in HBM.
    """
    fsdp_size = mesh.shape[AXIS_FSDP]

    def rule(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, _fsdp_spec(shape, fsdp_size, min_size))

    return jax.tree_util.tree_map(rule, params)


def shard_params(params: Any, mesh: Mesh, min_size: int = 2 ** 16) -> Any:
    """Device-put a parameter pytree with fsdp sharding."""
    shardings = fsdp_sharding(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

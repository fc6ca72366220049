from .mesh import (AXIS_DATA, AXIS_DCN, AXIS_FSDP, AXIS_SEQ, MeshConfig,
                   create_mesh, fsdp_sharding, data_sharding,
                   parse_mesh_spec, replicated, shard_params)
from .ulysses import set_mesh, get_mesh, seq_parallel_size, ulysses_attention

__all__ = [
    "AXIS_DATA", "AXIS_DCN", "AXIS_FSDP", "AXIS_SEQ", "MeshConfig",
    "create_mesh",
    "fsdp_sharding", "data_sharding", "parse_mesh_spec", "replicated",
    "shard_params",
    "set_mesh", "get_mesh", "seq_parallel_size", "ulysses_attention",
]

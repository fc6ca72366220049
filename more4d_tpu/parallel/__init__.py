from .mesh import (AXIS_DATA, AXIS_FSDP, AXIS_SEQ, MeshConfig, create_mesh,
                   fsdp_sharding, data_sharding, replicated)

__all__ = [
    "AXIS_DATA", "AXIS_FSDP", "AXIS_SEQ", "MeshConfig", "create_mesh",
    "fsdp_sharding", "data_sharding", "replicated",
]

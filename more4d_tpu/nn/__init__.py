from .layers import RMSNorm, layer_norm, sinusoidal_embedding
from .rope import RopeTables, rope_angles_3d, apply_rope
from .attention import attention

__all__ = [
    "RMSNorm", "layer_norm", "sinusoidal_embedding",
    "RopeTables", "rope_angles_3d", "apply_rope",
    "attention",
]

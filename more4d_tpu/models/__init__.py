from .wan_dit import WanDiT, DiTIntermediates

__all__ = ["WanDiT", "DiTIntermediates"]

from .base import BasePipeline, TeaCacheConfig, TEACACHE_COEFFICIENTS
from .control import WanControlPipeline
from .inpaint import WanInpaintPipeline

__all__ = ["BasePipeline", "WanControlPipeline", "WanInpaintPipeline",
           "TeaCacheConfig", "TEACACHE_COEFFICIENTS"]

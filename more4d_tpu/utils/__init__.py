from .quantize import quantize_params_fp8, dequantize_params
from .profiling import timer, trace

__all__ = ["quantize_params_fp8", "dequantize_params", "timer", "trace"]

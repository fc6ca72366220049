from .artifacts import (load_pointcloud_txt, make_grid, read_mask_video,
                        read_video_frames, save_pointcloud_txt,
                        save_videos_grid)
from .metrics import MetricsLogger
from .profiling import timer, trace
from .quantize import (cast_float_leaves, dequantize_params,
                       quantize_params_fp8)

__all__ = ["quantize_params_fp8", "dequantize_params",
           "cast_float_leaves", "timer", "trace",
           "save_videos_grid", "make_grid", "read_video_frames",
           "read_mask_video", "save_pointcloud_txt", "load_pointcloud_txt",
           "MetricsLogger"]

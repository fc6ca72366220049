from .projection import (homogenize_points, project, unproject,
                         get_world_rays, sample_image_grid,
                         get_intrinsic_matrix, back_project_coords)
from .normalize import (depth_normalization_factors, normalize_with_depth,
                        inverse_normalize_with_depth, first_frame_normalize,
                        inverse_flow_norm, sanitize_depth)
from .render import zbuffer_render, zbuffer_render_video
from .cameras import get_trajectory_generator, TRAJECTORY_TYPES

__all__ = [
    "homogenize_points", "project", "unproject", "get_world_rays",
    "sample_image_grid", "get_intrinsic_matrix", "back_project_coords",
    "depth_normalization_factors", "normalize_with_depth",
    "inverse_normalize_with_depth", "first_frame_normalize",
    "inverse_flow_norm", "sanitize_depth",
    "zbuffer_render", "zbuffer_render_video",
    "get_trajectory_generator", "TRAJECTORY_TYPES",
]

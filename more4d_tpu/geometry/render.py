"""Z-buffer point-cloud rendering via XLA segment reductions.

TPU-native replacement for the reference's torch_scatter + index_reduce
z-buffer renderer (render_with_project, scripts/inference/infer.py:222-256;
same scheme in ViSMDataset, MoRe4D/data/wan_dataset.py:433-470):

1. project points to normalized uv + depth;
2. keep points inside [0,1]^2 with depth >= 0;
3. per-pixel min-depth resolve (segment_min == index_reduce_ 'amin');
4. mean colour over the min-depth ties (segment mean == torch_scatter mean).

Pixel indexing matches the reference's x-major buffer
(idx = floor(u*W)*H + floor(v*H), reshaped (W, H) then transposed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import project

BIG = 3.4e38


def zbuffer_render(points, colors, extrinsic, intrinsic, height: int,
                   width: int):
    """points [N,3] world; colors [N,C] (any range); returns
    (image [H,W,C], hole_mask [H,W] bool — True where nothing landed)."""
    uv, depth = project(points, extrinsic, intrinsic)
    inb = ((uv[:, 0] >= 0) & (uv[:, 0] <= 1) &
           (uv[:, 1] >= 0) & (uv[:, 1] <= 1) & (depth >= 0))

    ix = jnp.clip(jnp.floor(uv[:, 0] * width), 0, width - 1)
    iy = jnp.clip(jnp.floor(uv[:, 1] * height), 0, height - 1)
    idx = (ix * height + iy).astype(jnp.int32)
    n_seg = width * height
    idx = jnp.where(inb, idx, n_seg)  # dump out-of-bounds into a spare bin

    depth_masked = jnp.where(inb, depth, BIG)
    min_depth = jax.ops.segment_min(depth_masked, idx, num_segments=n_seg + 1)
    keep = inb & (depth == min_depth[idx])

    w = keep.astype(jnp.float32)[:, None]
    csum = jax.ops.segment_sum(colors.astype(jnp.float32) * w, idx,
                               num_segments=n_seg + 1)
    cnt = jax.ops.segment_sum(w, idx, num_segments=n_seg + 1)
    img = csum[:n_seg] / jnp.maximum(cnt[:n_seg], 1.0)
    img = img.reshape(width, height, -1).transpose(1, 0, 2)
    hole = jnp.abs(img).sum(-1) == 0
    return img, hole


def zbuffer_render_video(points_video, colors, extrinsics, intrinsic,
                         height: int, width: int):
    """points_video [T,N,3]; extrinsics [T,4,4] (camera per frame);
    colors [N,C]. Returns (frames [T,H,W,C], holes [T,H,W])."""

    def render_one(pts, ext):
        return zbuffer_render(pts, colors, ext, intrinsic, height, width)

    return jax.vmap(render_one)(points_video, extrinsics)


def zbuffer_render_sweep(points_video, colors, extrinsics, intrinsic,
                         height: int, width: int):
    """Camera sweep over ONE per-frame cloud: points_video [T,N,3],
    extrinsics [K*T,4,4]; output frame j renders points_video[j % T].
    Sequential lax.map (not vmap) so only one frame's gathered cloud is
    live at a time — tiling the cloud K x for the 11-trajectory sweep
    (infer.py:906-924) costs ~1.2 GB of HBM at the operating point."""
    t = points_video.shape[0]

    def one(je):
        j, ext = je
        pts = jax.lax.dynamic_index_in_dim(points_video, j % t, 0,
                                           keepdims=False)
        return zbuffer_render(pts, colors, ext, intrinsic, height, width)

    idx = jnp.arange(extrinsics.shape[0], dtype=jnp.int32)
    return jax.lax.map(one, (idx, extrinsics))

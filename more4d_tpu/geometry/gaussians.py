"""Differentiable point-splat rendering (Gaussian splatting, TPU-native).

Replaces the reference's ``diff-gaussian-rasterization`` CUDA dependency
(MoRe4D/utils/gaussian_splatting.py:13-281). MoRe4D only ever rasterises
*isotropic, fixed-scale point splats*: scale = 1e-4 world units, identity
rotation, opacity 1, no SH (infer.py:258-266) — each gaussian covers at most
a few pixels. We exploit that: every point is splatted into a static KxK
pixel footprint with its projected 2D gaussian weight, and occlusion is a
soft z-test against the per-pixel minimum depth (temperature ``tau``):

    w_i(p) = G(||p - u_i||; sigma_i) * exp(-(z_i - z_min(p)) / tau)
    color(p) = sum w_i c_i / sum w_i

As tau -> 0 this converges to the exact z-buffer render (equivalence-tested);
it is fully differentiable w.r.t. points and colors (the CUDA rasterizer's
backward is only needed for 3DGS *optimization*, which MoRe4D does not do —
the pipeline consumes forward renders only, SURVEY.md §2.3).

An exact depth-sorted tile rasteriser in Pallas is the planned upgrade for
large anisotropic gaussians.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import project

BIG = 3.4e38


@partial(jax.jit, static_argnames=("height", "width", "footprint"))
def gs_render(points, colors, extrinsic, intrinsic, height: int, width: int,
              scale: float = 1e-4, opacity=None, tau: float = 1e-3,
              footprint: int = 3, background: float = 0.0):
    """points [N,3] world; colors [N,C] in [0,1]; extrinsic cam->world 4x4;
    intrinsic normalized 3x3. Returns (image [H,W,C], alpha [H,W]).

    Matches gs_render's camera conventions (gaussian_splatting.py:171-230:
    world->cam via inverse extrinsic, normalized intrinsics scaled by
    resolution)."""
    n = points.shape[0]
    uv, depth = project(points, extrinsic, intrinsic)
    u_pix = uv[:, 0] * width
    v_pix = uv[:, 1] * height

    # projected gaussian std in pixels; 0.3px low-pass like the reference
    # rasteriser's dilation
    fx = intrinsic[0, 0] * width
    sigma = jnp.maximum(scale * fx / jnp.maximum(depth, 1e-6), 0.3)

    valid = (depth > 0) & (u_pix >= -footprint) & \
        (u_pix < width + footprint) & (v_pix >= -footprint) & \
        (v_pix < height + footprint)
    if opacity is None:
        opacity = jnp.ones((n,), jnp.float32)

    n_seg = height * width
    ci = jnp.clip(jnp.floor(u_pix), 0, width - 1).astype(jnp.int32)
    cj = jnp.clip(jnp.floor(v_pix), 0, height - 1).astype(jnp.int32)

    r = footprint // 2
    offsets = [(di, dj) for di in range(-r, r + 1)
               for dj in range(-r, r + 1)]

    # pass 1: per-pixel min depth over all contributing splat positions
    min_depth = jnp.full((n_seg + 1,), BIG)
    idx_all, w_all = [], []
    for di, dj in offsets:
        px = ci + di
        py = cj + dj
        inb = valid & (px >= 0) & (px < width) & (py >= 0) & (py < height)
        idx = jnp.where(inb, py * width + px, n_seg)
        d2 = (px + 0.5 - u_pix) ** 2 + (py + 0.5 - v_pix) ** 2
        g = jnp.exp(-0.5 * d2 / (sigma ** 2)) * opacity
        g = jnp.where(inb, g, 0.0)
        idx_all.append(idx)
        w_all.append(g)
        # only splats with meaningful mass may claim the pixel's z-test;
        # otherwise sub-percent gaussian bleed would occlude whole pixels
        dmask = jnp.where(inb & (g > 0.05), depth, BIG)
        min_depth = jnp.minimum(
            min_depth, jax.ops.segment_min(dmask, idx, num_segments=n_seg + 1))

    # pass 2: soft-occlusion weighted accumulation
    csum = jnp.zeros((n_seg + 1, colors.shape[-1]))
    wsum = jnp.zeros((n_seg + 1,))
    cf = colors.astype(jnp.float32)
    for idx, g in zip(idx_all, w_all):
        occ = jnp.exp(-jnp.maximum(depth - min_depth[idx], 0.0) / tau)
        w = g * occ
        csum = csum + jax.ops.segment_sum(w[:, None] * cf, idx,
                                          num_segments=n_seg + 1)
        wsum = wsum + jax.ops.segment_sum(w, idx, num_segments=n_seg + 1)

    img = csum[:n_seg] / jnp.maximum(wsum[:n_seg, None], 1e-8)
    # coverage proxy: saturates quickly once any splat mass lands
    alpha = 1.0 - jnp.exp(-3.0 * wsum[:n_seg])
    img = jnp.where(wsum[:n_seg, None] > 1e-6, img, background)
    return img.reshape(height, width, -1), alpha.reshape(height, width)


def gs_render_video(points_video, colors, extrinsics, intrinsic, height,
                    width, scale: float = 1e-4, **kw):
    """points_video [T,N,3]; extrinsics [T,4,4] -> frames [T,H,W,C] + alpha.
    (gs_render_batch_moving, gaussian_splatting.py:45-112)."""

    def one(pts, ext):
        return gs_render(pts, colors, ext, intrinsic, height, width,
                         scale=scale, **kw)

    return jax.vmap(one)(points_video, extrinsics)

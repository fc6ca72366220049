"""Pallas TPU tile-based Gaussian splat rasteriser.

TPU-native replacement for the reference's ``diff-gaussian-rasterization``
CUDA kernel (MoRe4D/utils/gaussian_splatting.py:201-281; SURVEY.md §2.3).
MoRe4D rasterises isotropic fixed-scale point splats (scale 1e-4, identity
rotation, opacity 1, no SH — infer.py:258-266), so a point's footprint is a
few pixels and each splat overlaps at most a 2x2 tile neighbourhood.

Pipeline (all static shapes, fully jittable):

1. project points; duplicate each x4 into its candidate 16x16 tiles;
2. ONE XLA sort by (tile_id << 20 | quantized depth) — the TPU-friendly
   replacement for the CUDA kernel's per-tile key sort;
3. gather the front-most ``max_per_tile`` records per tile into dense
   [num_tiles, K] arrays (depth order; dropped tail is the farthest =
   occluded);
4. Pallas kernel, grid = tiles: front-to-back alpha compositing over the
   K points. The sequential blend is vectorised: for a chunk of 128
   points, per-pixel transmittance before point k is
   exp(exclusive-cumsum_k log(1 - w)) — a lane-axis cumsum — and the
   color accumulation becomes a [256,128] x [128,C] MXU matmul.

Differentiable w.r.t. nothing (forward-only, like the pipeline's use of the
CUDA rasteriser); the soft-z-test splat in geometry/gaussians.py remains the
differentiable path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.projection import project

TILE = 16
CHUNK = 128
DEPTH_BITS = 20


def _tile_records(points, colors, extrinsic, intrinsic, height, width,
                  scale, opacity, max_per_tile):
    """Project + sort + gather per-tile dense records."""
    n = points.shape[0]
    tiles_x = width // TILE
    tiles_y = height // TILE
    num_tiles = tiles_x * tiles_y

    uv, depth = project(points, extrinsic, intrinsic)
    u = uv[:, 0] * width
    v = uv[:, 1] * height
    fx = intrinsic[0, 0] * width
    sigma = jnp.maximum(scale * fx / jnp.maximum(depth, 1e-6), 0.3)
    if opacity is None:
        opacity = jnp.ones((n,), jnp.float32)

    valid = (depth > 0) & (u > -TILE) & (u < width + TILE) & \
        (v > -TILE) & (v < height + TILE)

    # candidate 2x2 tile block around the point (footprint <= 8 px)
    tx0 = jnp.floor((u - 4.0) / TILE).astype(jnp.int32)
    ty0 = jnp.floor((v - 4.0) / TILE).astype(jnp.int32)
    cand = []
    for dy in (0, 1):
        for dx in (0, 1):
            tx = tx0 + dx
            ty = ty0 + dy
            inb = valid & (tx >= 0) & (tx < tiles_x) & (ty >= 0) & \
                (ty < tiles_y)
            tid = jnp.where(inb, ty * tiles_x + tx, num_tiles)
            cand.append(tid)
    tile_ids = jnp.concatenate(cand)                       # [4N]
    rep = lambda a: jnp.tile(a, 4)                          # noqa: E731

    # depth bits sized so (num_tiles sentinel) << bits never overflows
    # int32: the packed key's tile field needs bit_length(num_tiles) bits,
    # leaving 31 - that for quantized depth (at 368x512 -> 20 bits; at
    # 720x1280/3600 tiles -> 19). Below 10 usable bits (≳2M tiles) fall
    # back to two stable sorts, which need no packing at all.
    depth_bits = min(DEPTH_BITS, 31 - int(num_tiles).bit_length())
    dmax = jnp.maximum(jnp.max(jnp.where(valid, depth, 0.0)), 1e-6)
    if depth_bits >= 10:
        dq = jnp.clip(depth / dmax * (2 ** depth_bits - 2), 0,
                      2 ** depth_bits - 2).astype(jnp.int32)
        key = tile_ids * (2 ** depth_bits) + rep(dq)
        order = jnp.argsort(key)
    else:
        by_depth = jnp.argsort(rep(depth))            # stable (jnp default)
        order = by_depth[jnp.argsort(tile_ids[by_depth])]
    sorted_tiles = tile_ids[order]
    src = order % n                                         # original point

    # contiguous per-tile ranges -> dense [num_tiles, K] gather
    starts = jnp.searchsorted(sorted_tiles, jnp.arange(num_tiles))
    ends = jnp.searchsorted(sorted_tiles, jnp.arange(num_tiles) + 1)
    k_idx = starts[:, None] + jnp.arange(max_per_tile)[None, :]
    mask = k_idx < ends[:, None]
    k_idx = jnp.minimum(k_idx, 4 * n - 1)
    point_idx = src[k_idx]                                  # [T, K]

    def g(a):
        # [T, 1, K]: the unit middle axis satisfies the TPU block-shape
        # constraint (block (1, 1, K) with K a lane multiple)
        return jnp.where(mask, a[point_idx], 0.0).astype(
            jnp.float32)[:, None]

    rec_u = g(u)
    rec_v = g(v)
    rec_s = jnp.where(mask, sigma[point_idx], 1.0).astype(
        jnp.float32)[:, None]
    rec_o = g(opacity)
    rec_c = jnp.where(mask[..., None], colors[point_idx], 0.0).astype(
        jnp.float32)                                        # [T, K, C]
    return rec_u, rec_v, rec_s, rec_o, rec_c, (tiles_y, tiles_x)


def _splat_kernel(u_ref, v_ref, s_ref, o_ref, c_ref, out_ref, *,
                  tiles_x: int, max_per_tile: int, channels: int):
    t = pl.program_id(0)
    ox = (t % tiles_x) * TILE
    oy = (t // tiles_x) * TILE

    pix = TILE * TILE
    px = (ox + jax.lax.broadcasted_iota(
        jnp.int32, (pix, 1), 0) % TILE).astype(jnp.float32) + 0.5
    py = (oy + jax.lax.broadcasted_iota(
        jnp.int32, (pix, 1), 0) // TILE).astype(jnp.float32) + 0.5

    n_chunks = max_per_tile // CHUNK

    def chunk_body(c, carry):
        logt, acc, alpha = carry
        sl = pl.ds(c * CHUNK, CHUNK)
        uu = u_ref[0, 0, sl][None, :]        # [1, CHUNK]
        vv = v_ref[0, 0, sl][None, :]
        ss = s_ref[0, 0, sl][None, :]
        oo = o_ref[0, 0, sl][None, :]
        d2 = (px - uu) ** 2 + (py - vv) ** 2                 # [pix, CHUNK]
        w = oo * jnp.exp(-0.5 * d2 / (ss * ss))
        w = jnp.minimum(w, 0.9999)
        lw = jnp.log1p(-w)
        # transmittance BEFORE each point: exclusive prefix-sum along the
        # point axis, realised as a matmul with a strictly-upper-triangular
        # ones matrix (cumsum is not lowerable in Pallas TPU; this rides
        # the MXU instead)
        row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        excl_upper = (row < col).astype(jnp.float32)
        cum = jax.lax.dot_general(
            lw, excl_upper, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + logt
        contrib = w * jnp.exp(cum)                           # [pix, CHUNK]
        col = c_ref[0, sl, :]                                # [CHUNK, C]
        acc = acc + jax.lax.dot_general(
            contrib, col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        alpha = alpha + jnp.sum(contrib, axis=1, keepdims=True)
        logt = logt + jnp.sum(lw, axis=1, keepdims=True)
        return logt, acc, alpha

    logt = jnp.zeros((pix, 1), jnp.float32)
    acc = jnp.zeros((pix, channels), jnp.float32)
    alpha = jnp.zeros((pix, 1), jnp.float32)
    logt, acc, alpha = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                         (logt, acc, alpha))
    out_ref[0] = jnp.concatenate([acc, alpha], axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "max_per_tile", "interpret"))
def gs_render_tiled(points, colors, extrinsic, intrinsic, height: int,
                    width: int, scale: float = 1e-4, opacity=None,
                    max_per_tile: int = 512, background: float = 0.0,
                    interpret: bool = None) -> Tuple[jnp.ndarray,
                                                     jnp.ndarray]:
    """points [N,3] world; colors [N,C]; extrinsic cam->world 4x4; intrinsic
    normalized 3x3 -> (image [H,W,C], alpha [H,W]).

    H and W must be multiples of 16 (the reference's operating points are).
    """
    assert height % TILE == 0 and width % TILE == 0, (height, width)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = colors.shape[-1]
    rec_u, rec_v, rec_s, rec_o, rec_c, (ty, tx) = _tile_records(
        points, colors, extrinsic, intrinsic, height, width, scale,
        opacity, max_per_tile)
    num_tiles = ty * tx

    kernel = functools.partial(_splat_kernel, tiles_x=tx,
                               max_per_tile=max_per_tile, channels=c)
    vec_spec = pl.BlockSpec((1, 1, max_per_tile), lambda t: (t, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[vec_spec, vec_spec, vec_spec, vec_spec,
                  pl.BlockSpec((1, max_per_tile, c), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, TILE * TILE, c + 1), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE * TILE, c + 1),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(rec_u, rec_v, rec_s, rec_o, rec_c)

    out = out.reshape(ty, tx, TILE, TILE, c + 1)
    out = out.transpose(0, 2, 1, 3, 4).reshape(height, width, c + 1)
    img, alpha = out[..., :c], out[..., c]
    img = img + background * (1.0 - alpha[..., None])
    return img, alpha


def gs_render_tiled_video(points_video, colors, extrinsics, intrinsic,
                          height, width, scale: float = 1e-4, **kw):
    """points_video [T,N,3]; extrinsics [T,4,4] -> (frames [T,H,W,C],
    alpha [T,H,W]) — the gs_render_batch_moving entry point
    (gaussian_splatting.py:45-112)."""

    def one(pe):
        pts, ext = pe
        return gs_render_tiled(pts, colors, ext, intrinsic, height, width,
                               scale=scale, **kw)

    return jax.lax.map(one, (points_video, extrinsics))


def gs_render_sweep(points_video, colors, extrinsics, intrinsic,
                    height, width, scale: float = 1e-4, **kw):
    """Camera sweep over ONE per-frame cloud: points_video [T,N,3],
    extrinsics [K*T,4,4]; output frame j renders points_video[j % T].

    The reference's sweep re-renders the same cloud under 11 camera
    trajectories (infer.py:906-924).  Tiling the cloud K x (the obvious
    ``gs_render_tiled_video(jnp.tile(coords, (K,1,1)), ...)``) puts
    K*T*N*3 float32 of coordinates in HBM — ~1.2 GB at the operating
    point — which OOMs alongside the stage-2 models; indexing inside the
    sequential lax.map keeps exactly one frame's cloud live."""
    t = points_video.shape[0]

    def one(je):
        j, ext = je
        pts = jax.lax.dynamic_index_in_dim(points_video, j % t, 0,
                                           keepdims=False)
        return gs_render_tiled(pts, colors, ext, intrinsic, height, width,
                               scale=scale, **kw)

    idx = jnp.arange(extrinsics.shape[0], dtype=jnp.int32)
    return jax.lax.map(one, (idx, extrinsics))

"""Pallas tile splat rasteriser vs the soft-z-test XLA splat and exact
z-buffer semantics (interpret mode on CPU; real-TPU timing in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from more4d_tpu.geometry.cameras import generate_trajectory
from more4d_tpu.geometry.gaussians import gs_render, gs_render_video
from more4d_tpu.geometry.projection import get_intrinsic_matrix
from more4d_tpu.kernels.gs_splat import (gs_render_tiled,
                                         gs_render_tiled_video)

H, W = 48, 64


def _scene(n=3000, seed=0):
    rs = np.random.RandomState(seed)
    pts = np.stack([rs.uniform(-0.5, 0.5, n), rs.uniform(-0.35, 0.35, n),
                    rs.uniform(1.0, 3.0, n)], -1).astype(np.float32)
    cols = rs.rand(n, 3).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)
    intr = np.asarray(get_intrinsic_matrix(H, W), np.float32)
    return jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(ext), \
        jnp.asarray(intr)


def test_tiled_matches_zbuffer_on_planes():
    """Two dense planes with locally-constant colors: the tiled compositor
    must show the near plane exactly like the z-buffer oracle."""
    from more4d_tpu.geometry.render import zbuffer_render

    rs = np.random.RandomState(0)
    n = 6000
    near = np.stack([rs.uniform(-0.45, 0.05, n // 2),
                     rs.uniform(-0.35, 0.35, n // 2),
                     np.full(n // 2, 1.2)], -1)
    far = np.stack([rs.uniform(-0.45, 0.45, n // 2),
                    rs.uniform(-0.35, 0.35, n // 2),
                    np.full(n // 2, 3.0)], -1)
    pts = jnp.asarray(np.concatenate([near, far]), jnp.float32)
    cols = jnp.asarray(
        np.concatenate([np.tile([1.0, 0.1, 0.1], (n // 2, 1)),
                        np.tile([0.1, 1.0, 0.1], (n // 2, 1))]),
        jnp.float32)
    ext = jnp.eye(4)
    intr = jnp.asarray(get_intrinsic_matrix(H, W), jnp.float32)

    img_t, alpha_t = gs_render_tiled(pts, cols, ext, intr, H, W,
                                     scale=2e-2)
    img_z, hole = zbuffer_render(pts, cols, ext, intr, H, W)
    img_t, alpha_t = np.asarray(img_t), np.asarray(alpha_t)
    img_z, hole = np.asarray(img_z), np.asarray(hole)

    both = (alpha_t > 0.5) & (~hole.astype(bool))
    assert both.mean() > 0.15, both.mean()
    diff = np.abs(img_t[both] - img_z[both])
    assert np.quantile(diff, 0.9) < 0.1, np.quantile(diff, 0.9)
    # coverage agreement with the z-buffer hole mask
    agree = ((alpha_t > 0.4) == ~hole.astype(bool)).mean()
    assert agree > 0.85, agree


def test_tiled_occlusion_front_wins():
    """Two coincident-screen points: the nearer must dominate."""
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]], jnp.float32)
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    ext = jnp.eye(4)
    intr = jnp.asarray(get_intrinsic_matrix(H, W), jnp.float32)
    # sigma = scale*fx/z ~ 1.2px so a lone splat carries real alpha
    img, alpha = gs_render_tiled(pts, cols, ext, intr, H, W,
                                 scale=0.019)
    img = np.asarray(img)
    cy, cx = np.unravel_index(np.asarray(alpha).argmax(),
                              (H, W))
    # near red point dominates; the far green one is mostly occluded
    assert img[cy, cx, 0] > 0.6, img[cy, cx]
    assert img[cy, cx, 0] > 5.0 * img[cy, cx, 1], img[cy, cx]


def test_tiled_empty_tile_is_background():
    pts = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    cols = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    ext = jnp.eye(4)
    intr = jnp.asarray(get_intrinsic_matrix(H, W), jnp.float32)
    img, alpha = gs_render_tiled(pts, cols, ext, intr, H, W,
                                 scale=0.019, background=0.25)
    img, alpha = np.asarray(img), np.asarray(alpha)
    corner = img[:8, :8]
    np.testing.assert_allclose(corner, 0.25, atol=1e-5)
    assert alpha[:8, :8].max() < 1e-6
    assert alpha.max() > 0.5  # the one splat landed


def test_tiled_video_matches_per_frame():
    pts, cols, ext, intr = _scene(800, seed=1)
    t = 3
    pv = jnp.broadcast_to(pts[None], (t,) + pts.shape)
    exts = jnp.asarray(generate_trajectory(
        "static", np.asarray(pts).mean(0), t), jnp.float32)
    frames, alphas = gs_render_tiled_video(pv, cols, exts, intr, H, W)
    assert frames.shape == (t, H, W, 3) and alphas.shape == (t, H, W)
    f0, a0 = gs_render_tiled(pts, cols, exts[0], intr, H, W)
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(f0),
                               atol=1e-5)


def test_sweep_matches_tiled_video():
    """gs_render_sweep([T,N,3], exts [K*T]) == tiled_video on the K x
    tiled cloud — the sweep form avoids materializing the tile."""
    from more4d_tpu.kernels.gs_splat import gs_render_sweep

    pts, cols, _ext, intr = _scene(600, seed=3)
    t, k = 2, 3
    rs = np.random.RandomState(5)
    pv = jnp.asarray(rs.uniform(-0.5, 0.5, (t,) + pts.shape)
                     + np.asarray(pts), jnp.float32)
    center = np.asarray(pts).mean(0)
    exts = jnp.concatenate([
        jnp.asarray(generate_trajectory(name, center, t), jnp.float32)
        for name in ("static", "circle_rotating", "surrounding")], axis=0)
    f_sweep, a_sweep = gs_render_sweep(pv, cols, exts, intr, H, W)
    f_tile, a_tile = gs_render_tiled_video(
        jnp.tile(pv, (k, 1, 1)), cols, exts, intr, H, W)
    np.testing.assert_allclose(np.asarray(f_sweep), np.asarray(f_tile),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_sweep), np.asarray(a_tile),
                               atol=1e-5)


def test_tile_records_no_int32_overflow_at_720p():
    """Regression: at 720x1280 (3600 tiles) the packed (tile, depth) sort
    key used to overflow int32 via the tid=num_tiles sentinel, corrupting
    the tile sort. Verify the per-tile records are depth-sorted and land in
    the right tiles."""
    from more4d_tpu.kernels.gs_splat import TILE, _tile_records

    h, w = 720, 1280
    rs = np.random.RandomState(3)
    n = 2000
    pts = np.stack([rs.uniform(-0.6, 0.6, n), rs.uniform(-0.45, 0.45, n),
                    rs.uniform(1.0, 4.0, n)], -1).astype(np.float32)
    cols = rs.rand(n, 3).astype(np.float32)
    ext = jnp.eye(4)
    intr = jnp.asarray(get_intrinsic_matrix(h, w), jnp.float32)
    ru, rv, rsig, ro, rc, (ty, tx) = _tile_records(
        jnp.asarray(pts), jnp.asarray(cols), ext, intr, h, w,
        scale=1e-2, opacity=None, max_per_tile=64)
    assert ty * tx == 3600
    ru, rv, ro = map(np.asarray, (ru, rv, ro))
    occupied = (ro[:, 0] > 0)
    assert occupied.any()
    # every record's pixel position must lie within (or hugging) its tile
    rsig = np.asarray(rsig)
    tids = np.nonzero(occupied.any(axis=1))[0]
    for t in tids[:50]:
        k = occupied[t]
        ux, vy = ru[t, 0][k], rv[t, 0][k]
        tx_i, ty_i = t % tx, t // tx
        assert (np.abs(ux - (tx_i * TILE + TILE / 2)) <= 1.5 * TILE).all()
        assert (np.abs(vy - (ty_i * TILE + TILE / 2)) <= 1.5 * TILE).all()
        # front-to-back: sigma = scale*fx/depth decreases with depth, so
        # records must be sigma-non-increasing (up to quantization ties)
        sig = rsig[t, 0][k]
        assert (np.diff(sig) <= 1e-3).all(), sig


def test_tiled_max_per_tile_drops_farthest():
    """Overflow beyond max_per_tile drops only the farthest (occluded)
    points — the image of the near surface is unchanged."""
    rs = np.random.RandomState(2)
    # 600 points in one tile: 300 near (z=1), 300 far (z=5)
    base = rs.uniform(-0.02, 0.02, (300, 2))
    near = np.concatenate([base, np.full((300, 1), 1.0)], -1)
    far = np.concatenate([base, np.full((300, 1), 5.0)], -1)
    pts = jnp.asarray(np.concatenate([near, far]), jnp.float32)
    cols = jnp.asarray(np.concatenate([np.ones((300, 3)),
                                       np.zeros((300, 3))]), jnp.float32)
    ext = jnp.eye(4)
    intr = jnp.asarray(get_intrinsic_matrix(H, W), jnp.float32)
    full, _ = gs_render_tiled(pts, cols, ext, intr, H, W, scale=2e-3,
                              max_per_tile=2048)
    capped, _ = gs_render_tiled(pts, cols, ext, intr, H, W, scale=2e-3,
                                max_per_tile=1280)
    np.testing.assert_allclose(np.asarray(capped), np.asarray(full),
                               atol=2e-2)

"""Geometry: projection golden vs reference, normalization inverses,
z-buffer renderer correctness, camera trajectories."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from more4d_tpu.geometry import (back_project_coords, get_intrinsic_matrix,
                                 inverse_flow_norm,
                                 inverse_normalize_with_depth,
                                 normalize_with_depth, project,
                                 sample_image_grid, unproject,
                                 zbuffer_render)
from more4d_tpu.geometry.cameras import TRAJECTORY_TYPES, generate_trajectory
from more4d_tpu.geometry.normalize import first_frame_normalize


def _random_pose(rng):
    a, b, c = rng.uniform(-0.5, 0.5, 3)

    def rot(axis, t):
        cs, sn = np.cos(t), np.sin(t)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = cs
        m[j, j] = cs
        m[i, j] = -sn
        m[j, i] = sn
        return m

    r = rot(0, a) @ rot(1, b) @ rot(2, c)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = r
    ext[:3, 3] = rng.uniform(-0.2, 0.2, 3)
    return ext


def test_project_golden_vs_reference():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "tests")
    from _ref_loader import load_reference_module

    ref = load_reference_module("MoRe4D/utils/project_utils.py",
                                "ref_project_utils")
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32) + np.array([0, 0, 3],
                                                          np.float32)
    ext = _random_pose(rng)
    intr = np.asarray(get_intrinsic_matrix(368, 512))

    uv_ref, d_ref = ref.project(torch.from_numpy(pts),
                                torch.from_numpy(ext),
                                torch.from_numpy(intr))
    uv, d = project(jnp.asarray(pts), jnp.asarray(ext), jnp.asarray(intr))
    np.testing.assert_allclose(np.asarray(uv), uv_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_project_unproject_roundtrip():
    rng = np.random.RandomState(1)
    intr = get_intrinsic_matrix(368, 512)
    pts = jnp.asarray(rng.randn(50, 3).astype(np.float32)
                      + np.array([0, 0, 4], np.float32))
    ext = jnp.eye(4)
    uv, depth = project(pts, ext, intr)
    rec = unproject(uv, depth, intr)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), rtol=1e-4,
                               atol=1e-4)


def test_back_project_matches_intrinsics():
    depth = jnp.ones((12, 16)) * 2.5
    pts = back_project_coords(depth, 12, 16)
    assert pts.shape == (12, 16, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.5, rtol=1e-5)


def test_depth_normalization_inverse_consistency():
    rng = np.random.RandomState(2)
    flow = rng.randn(2, 5, 8, 10, 3).astype(np.float32)
    flow[..., 2] += 4.0  # positive depth
    frame0 = flow[:, 0]
    norm = normalize_with_depth(jnp.asarray(flow))
    rec = inverse_normalize_with_depth(norm, jnp.asarray(frame0))
    np.testing.assert_allclose(np.asarray(rec), flow, rtol=1e-4, atol=1e-4)
    # frame 0 of the normalized flow is exactly zero (delta from itself)
    np.testing.assert_allclose(np.asarray(norm[:, 0]), 0.0, atol=1e-6)


def test_first_frame_norm_inverse_consistency():
    rng = np.random.RandomState(3)
    flow = rng.randn(2, 5, 8, 10, 3).astype(np.float32) * 3
    rel, diff = first_frame_normalize(jnp.asarray(flow))
    rec, diff2 = inverse_flow_norm(rel, jnp.asarray(flow[:, 0]))
    np.testing.assert_allclose(np.asarray(rec), flow, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(diff), np.asarray(diff2),
                               rtol=1e-6)


def test_zbuffer_renderer_min_depth_and_mean():
    h = w = 4
    intr = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    ext = jnp.eye(4)
    # two points projecting to the same pixel at different depths; the
    # nearer must win. two more tie at the same depth -> mean colour.
    pts = jnp.asarray([
        [0.1, 0.1, 1.0],    # uv=(0.6,0.6) -> pixel (2,2), depth 1 (winner)
        [0.2, 0.2, 2.0],    # same uv, depth 2 (hidden)
        [0.3, 0.3, 1.0],    # uv=(0.8,0.8) -> pixel (3,3)
        [0.3, 0.3, 1.0],    # same pixel same depth  (tie -> mean)
    ])
    cols = jnp.asarray([[10.0], [99.0], [4.0], [8.0]])
    img, hole = zbuffer_render(pts, cols, ext, intr, h, w)
    assert img[2, 2, 0] == 10.0
    # tie pixel: uv=0.8 -> ix=3, iy=3 -> mean(4, 8) = 6
    assert img[3, 3, 0] == 6.0
    assert bool(hole[0, 0]) and not bool(hole[2, 2])


def test_zbuffer_ignores_behind_camera_and_oob():
    h = w = 4
    intr = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
    ext = jnp.eye(4)
    pts = jnp.asarray([[0.0, 0.0, -1.0], [9.0, 9.0, 1.0]])
    cols = jnp.ones((2, 3))
    img, hole = zbuffer_render(pts, cols, ext, intr, h, w)
    assert np.asarray(hole).all()


def test_zbuffer_sweep_matches_video():
    """zbuffer_render_sweep([T,N,3], exts [K*T]) == _video on the K x
    tiled cloud (the sweep form keeps one frame's cloud live)."""
    from more4d_tpu.geometry.cameras import generate_trajectory
    from more4d_tpu.geometry.render import (zbuffer_render_sweep,
                                            zbuffer_render_video)

    rs = np.random.RandomState(2)
    t, k, n, h, w = 2, 3, 500, 16, 24
    pv = jnp.asarray(np.stack([
        np.stack([rs.uniform(-0.5, 0.5, n), rs.uniform(-0.35, 0.35, n),
                  rs.uniform(1.0, 3.0, n)], -1) for _ in range(t)]),
        jnp.float32)
    cols = jnp.asarray(rs.rand(n, 3), jnp.float32)
    intr = jnp.asarray(get_intrinsic_matrix(h, w), jnp.float32)
    center = np.asarray(pv).reshape(-1, 3).mean(0)
    exts = jnp.concatenate([
        jnp.asarray(generate_trajectory(name, center, t), jnp.float32)
        for name in ("static", "circle_rotating", "surrounding")], axis=0)
    f_s, h_s = zbuffer_render_sweep(pv, cols, exts, intr, h, w)
    f_v, h_v = zbuffer_render_video(jnp.tile(pv, (k, 1, 1)), cols, exts,
                                    intr, h, w)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_v), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_v))


def test_trajectories_shapes_and_validity():
    center = np.array([0.1, 0.2, 2.0])
    for name, kw in TRAJECTORY_TYPES:
        exts = generate_trajectory(name, center, 12, **kw)
        assert exts.shape == (12, 4, 4)
        for e in exts:
            r = e[:3, :3]
            np.testing.assert_allclose(np.abs(np.linalg.det(r)), 1.0,
                                       rtol=1e-4)
        np.testing.assert_allclose(
            exts[:, 3], np.tile([0, 0, 0, 1], (12, 1)), atol=1e-6)


def test_sample_image_grid():
    coords, idx = sample_image_grid((4, 6))
    assert coords.shape == (4, 6, 2)
    # xy order: last axis is (x=col, y=row), pixel centres
    np.testing.assert_allclose(np.asarray(coords[0, 0]),
                               [0.5 / 6, 0.5 / 4], rtol=1e-6)

"""Camera projection / unprojection (JAX).

Re-implements MoRe4D/utils/project_utils.py (project :59-71, unproject :74,
get_world_rays :91, sample_image_grid :117) and the inference-side intrinsic
construction + depth back-projection (scripts/inference/infer.py:161-195).
Conventions follow the reference: intrinsics are *normalized* (uv in [0,1]),
extrinsics are cam->world rigid transforms (world2cam uses the inverse).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Reference capture resolution used to derive intrinsics (infer.py:53).
DEFAULT_H_ORI, DEFAULT_W_ORI = 540, 960


def homogenize_points(points):
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors):
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])],
                           axis=-1)


def project(points, extrinsics, intrinsics, epsilon: float = 1.19e-7):
    """World points -> (normalized uv, camera depth) (project_utils.py:59-71)."""
    p = homogenize_points(points)
    w2c = jnp.linalg.inv(extrinsics)
    cam = jnp.einsum("...ij,...j->...i", w2c, p)[..., :-1]
    depth = cam[..., -1]
    ndc = cam / (cam[..., -1:] + epsilon)
    ndc = jnp.nan_to_num(ndc, posinf=1e8, neginf=-1e8)
    uv = jnp.einsum("...ij,...j->...i", intrinsics, ndc)[..., :-1]
    return uv, depth


def unproject(coordinates, z, intrinsics):
    """Normalized uv + depth -> camera-space xyz (project_utils.py:74-88)."""
    coords = homogenize_points(coordinates)
    rays = jnp.einsum("...ij,...j->...i", jnp.linalg.inv(intrinsics), coords)
    return rays * z[..., None]


def get_world_rays(coordinates, extrinsics, intrinsics):
    """(origins, directions) in world space (project_utils.py:91-114)."""
    directions = unproject(coordinates,
                           jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1,
                                              keepdims=True)
    directions = homogenize_vectors(directions)
    directions = jnp.einsum("...ij,...j->...i", extrinsics,
                            directions)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: Tuple[int, ...]):
    """Pixel-centre normalized coordinates (xy) + integer indices (ij)
    (project_utils.py:117-139)."""
    indices = jnp.stack(jnp.meshgrid(
        *[jnp.arange(n) for n in shape], indexing="ij"), axis=-1)
    coords = (indices.astype(jnp.float32) + 0.5) / jnp.asarray(
        shape, jnp.float32)
    coords = coords[..., ::-1]  # ij -> xy
    return coords, indices


def get_intrinsic_matrix(height: int, width: int,
                         h_ori: int = DEFAULT_H_ORI,
                         w_ori: int = DEFAULT_W_ORI):
    """Normalized intrinsics matching the reference capture aspect
    (infer.py:161-176)."""
    if w_ori / width > h_ori / height:
        fx = 1.0
        fy = w_ori / h_ori / (width / height)
    else:
        fy = 1.0
        fx = h_ori / w_ori / (height / width)
    return jnp.asarray([[fx, 0.0, 0.5], [0.0, fy, 0.5], [0.0, 0.0, 1.0]],
                       jnp.float32)


def back_project_coords(depth_map, height: int, width: int, intrinsics=None):
    """Depth map [H', W'] -> per-pixel 3D points [H, W, 3] (infer.py:179-195).

    The uv grid uses linspace(0, 1) inclusive endpoints, matching the
    reference exactly (not pixel centres).
    """
    import jax

    depth = jax.image.resize(depth_map[None, None], (1, 1, height, width),
                             "bilinear")[0, 0]
    if intrinsics is None:
        intrinsics = get_intrinsic_matrix(height, width)
    u = jnp.linspace(0.0, 1.0, width)
    v = jnp.linspace(0.0, 1.0, height)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    pixels = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)
    rays = pixels @ jnp.linalg.inv(intrinsics).T
    return rays * depth[..., None]

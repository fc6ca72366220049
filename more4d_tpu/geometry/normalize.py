"""Scale-invariant trajectory (scene-flow) normalization + inverses.

Three schemes from the reference, each with an exact inverse (the round-trip
is identity — tested):

1. depth-guided motion normalization (STraGDataset._normalize_with_depth,
   MoRe4D/data/wan_dataset.py:898-930): per-pixel flow deltas are divided by
   z0/f per axis (x, y) and by z0 for z — motion in units of first-frame
   depth, removing metric scale.
2. first-frame min/max normalization + inverse
   (inverse_flow_norm_transform_no_diff, scripts/inference/infer.py:198-219).
3. absolute mode ('normalize_track_z', infer.py:858-861): the model predicts
   coords minus the first frame; inverse adds the first frame back.

Layout here is channel-last [B, T, H, W, 3] (xyz).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Dataset-side factors use a 720x960 capture at 368x512 training res
# (wan_dataset.py:911-918); the inference intrinsics use 540x960 (infer.py:53).
DATASET_H_ORI, DATASET_W_ORI = 720, 960


def _focal_factors(height: int, width: int, h_ori: int, w_ori: int
                   ) -> Tuple[float, float]:
    if w_ori / width > h_ori / height:
        fx = 1.0
        fy = w_ori / h_ori / (width / height)
    else:
        fy = 1.0
        fx = h_ori / w_ori / (height / width)
    return fx, fy


def depth_normalization_factors(frame0, height: int, width: int,
                                h_ori: int = DATASET_H_ORI,
                                w_ori: int = DATASET_W_ORI):
    """Per-pixel (nx, ny, nz) divisors from the first frame's depth.
    frame0: [B, H, W, 3]."""
    fx, fy = _focal_factors(height, width, h_ori, w_ori)
    z0 = sanitize_depth(frame0[..., 2])
    return z0 / fx, z0 / fy, z0


def sanitize_depth(z):
    """NaN/Inf/0 -> 1.0 (wan_dataset.py:906-908)."""
    z = jnp.nan_to_num(z, nan=1.0, posinf=1.0, neginf=1.0)
    return jnp.where(z == 0, 1.0, z)


def normalize_with_depth(flow, h_ori: int = DATASET_H_ORI,
                         w_ori: int = DATASET_W_ORI):
    """flow [B,T,H,W,3] absolute coords -> normalized deltas [B,T,H,W,3].

    delta = flow - flow[:, :1]; delta_x /= z0/fx; delta_y /= z0/fy;
    delta_z /= z0 (wan_dataset.py:898-930).
    """
    b, t, h, w, _ = flow.shape
    delta = flow - flow[:, :1]
    nx, ny, nz = depth_normalization_factors(flow[:, 0], h, w, h_ori, w_ori)
    out = jnp.stack([
        delta[..., 0] / nx[:, None],
        delta[..., 1] / ny[:, None],
        delta[..., 2] / nz[:, None],
    ], axis=-1)
    return out


def inverse_normalize_with_depth(normalized, frame0,
                                 h_ori: int = DATASET_H_ORI,
                                 w_ori: int = DATASET_W_ORI):
    """Exact inverse of :func:`normalize_with_depth` given the first frame's
    absolute coordinates frame0 [B,H,W,3]. Returns absolute coords."""
    b, t, h, w, _ = normalized.shape
    nx, ny, nz = depth_normalization_factors(frame0, h, w, h_ori, w_ori)
    delta = jnp.stack([
        normalized[..., 0] * nx[:, None],
        normalized[..., 1] * ny[:, None],
        normalized[..., 2] * nz[:, None],
    ], axis=-1)
    return delta + frame0[:, None]


def first_frame_normalize(flow):
    """Min/max first-frame normalization: x -> x/diff - frame0/diff, where
    diff = max over axes of (per-axis range of frame0). Returns (rel, diff).
    Matches the forward of inverse_flow_norm (infer.py:198-219)."""
    b = flow.shape[0]
    frame0 = flow[:, 0]                              # [B,H,W,3]
    flat = frame0.reshape(b, -1, 3)
    diff = (flat.max(axis=1) - flat.min(axis=1)).max(axis=-1)  # [B]
    diff = jnp.where(diff == 0, 1.0, diff)[:, None, None, None, None]
    rel = flow / diff - frame0[:, None] / diff
    return rel, diff[:, 0, 0, 0, 0]


def inverse_flow_norm(rel_flow, first_frame_coords):
    """inverse_flow_norm_transform_no_diff (infer.py:198-219).

    rel_flow: [B,T,H,W,3] model output; first_frame_coords: [B,H,W,3]
    absolute. Returns (absolute flow [B,T,H,W,3], diff [B])."""
    b = rel_flow.shape[0]
    flat = first_frame_coords.reshape(b, -1, 3)
    diff = (flat.max(axis=1) - flat.min(axis=1)).max(axis=-1)
    diff = jnp.where(diff == 0, 1.0, diff)
    d = diff[:, None, None, None, None]
    frame0_normalized = first_frame_coords[:, None] / d
    recovered = (rel_flow + frame0_normalized) * d
    return recovered, diff

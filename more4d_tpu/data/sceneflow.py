"""Scene-flow (dense point-trajectory) sample loading + preparation.

Host-side numpy reimplementation of STraGDataset
(MoRe4D/data/wan_dataset.py:690-995): ``*_dt3d_pred.pkl`` files hold
``coords [T, H*W, 3]`` (per-pixel 3D world coordinates over time) and
``colors [H*W, 3]`` of the first frame. Preparation:

- reshape to [T, H, W, 3];
- depth-guided motion normalization (the config used for 4D-STraG) or
  first-frame min/max normalization (normalize_flow), with the
  skip-large-depth filter (diff/coords > 500 -> reject, :885-890);
- frame limit/pad to max_num_frames = 49 (:932);
- control video = the first RGB frame repeated T times (:944-972);
- text dropout handled by the caller (0.1, :830).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SceneFlowSample:
    flow: np.ndarray            # [T, H, W, 3] normalized trajectory target
    first_frame_coords: np.ndarray   # [H, W, 3] absolute
    control_video: np.ndarray   # [T, H, W, 3] repeated first frame, [-1, 1]
    first_frame_rgb: np.ndarray  # [H, W, 3] in [0, 1] (MPM input)
    depth_image: np.ndarray     # [1, H, W, 3] depth in [-1, 1]


def load_sceneflow_pickle(path: str, height: int, width: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (coords [T, H, W, 3], colors [H, W, 3] in [0, 255])."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    coords = np.asarray(data["coords"], np.float32)
    colors = np.asarray(data["colors"], np.float32)
    if coords.ndim == 3:
        coords = coords.reshape(coords.shape[0], height, width, 3)
    if colors.ndim == 2:
        colors = colors.reshape(height, width, 3)
    return coords, colors


def depth_to_image(depth: np.ndarray) -> np.ndarray:
    """Depth map [H, W] -> 3ch image in [-1, 1] via per-image min-max
    normalization (train_wan.py:1375-1385 / infer.py:823-827): clamp to
    [0, 1e4], replace non-finite/near-zero with 1, then
    2*(d-min)/(max-min+1e-8)-1."""
    d = np.clip(depth, 0.0, 10000.0)
    d[~np.isfinite(d) | (d < 1e-5)] = 1.0
    dmin, dmax = d.min(), d.max()
    d = 2.0 * (d - dmin) / (dmax - dmin + 1e-8) - 1.0
    return np.repeat(d[..., None], 3, axis=-1).astype(np.float32)


def prepare_straag_sample(coords: np.ndarray, colors: np.ndarray,
                          max_num_frames: int = 49,
                          normalize: str = "depth",
                          skip_large_depth: bool = True,
                          large_depth_threshold: float = 500.0
                          ) -> Optional[SceneFlowSample]:
    """coords [T, H, W, 3]; colors [H, W, 3] in [0, 255]. Returns None when
    the sample fails the large-depth filter (the reference raises and
    retries with another sample, :796-810)."""
    import jax.numpy as jnp

    from ..geometry.normalize import (first_frame_normalize,
                                      normalize_with_depth)

    t, h, w, _ = coords.shape
    if skip_large_depth:
        frame0 = coords[0]
        rng0 = (frame0.reshape(-1, 3).max(0) - frame0.reshape(-1, 3).min(0))
        if normalize == "minmax" and rng0.max() > large_depth_threshold:
            return None
        if normalize != "minmax" and np.abs(coords).max() \
                > large_depth_threshold:
            return None

    c = coords[None]  # [1, T, H, W, 3]
    if normalize == "depth":
        flow = np.asarray(normalize_with_depth(jnp.asarray(c)))[0]
    elif normalize == "minmax":
        rel, _ = first_frame_normalize(jnp.asarray(c))
        flow = np.asarray(rel)[0]
    elif normalize == "track_z":
        flow = coords - coords[:1]
    else:
        raise ValueError(normalize)

    # limit/pad frames to 1+4k (:932)
    if flow.shape[0] > max_num_frames:
        flow = flow[:max_num_frames]
    elif flow.shape[0] < max_num_frames:
        pad = np.repeat(flow[-1:], max_num_frames - flow.shape[0], axis=0)
        flow = np.concatenate([flow, pad], axis=0)

    rgb01 = colors / 255.0
    control = np.repeat((rgb01 * 2 - 1)[None], max_num_frames, axis=0)
    depth_img = depth_to_image(coords[0, ..., 2])[None]

    return SceneFlowSample(
        flow=flow.astype(np.float32),
        first_frame_coords=coords[0],
        control_video=control.astype(np.float32),
        first_frame_rgb=rgb01.astype(np.float32),
        depth_image=depth_img,
    )

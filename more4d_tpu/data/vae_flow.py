"""VAE-adaptor training dataset (host-side numpy).

Re-implements MoRe4D/data/vae_dataset.py:14-67: sceneflow pkls listed by a
``video_column`` txt file (paths mapped ``videos -> dt3d<posfix>``,
``.mp4 -> _dt3d_pred.pkl``), each yielding:

- ``coords``            [T, H, W, 3]  absolute per-pixel 3D trajectories
- ``coords_delta``      coords - coords[0:1]   (:62, the enabled variant)
- ``coords_normalized`` coords[:max_frames] / abs(coords[:max_frames]).max()
- ``colors``            [H, W, 3]
- ``vis``               [T, H, W] visibility mask

Channel-last numpy (the framework's host convention; the reference keeps
torch NCTHW)."""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import List, Optional

import numpy as np


def sceneflow_paths_from_list(list_path: str, posfix: str = "",
                              data_root: Optional[str] = None) -> List[str]:
    """``load_sceneflow`` (vae_dataset.py:9-11): one video path per line,
    rewritten to the sceneflow pkl convention."""
    base = data_root or os.path.dirname(os.path.abspath(list_path))
    out = []
    with open(list_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            p = line.replace("videos", "dt3d" + posfix).replace(
                ".mp4", "_dt3d_pred.pkl")
            out.append(p if os.path.isabs(p) else os.path.join(base, p))
    return out


@dataclasses.dataclass
class VAEFlowSample:
    coords: np.ndarray            # [T, H, W, 3]
    coords_delta: np.ndarray      # [T, H, W, 3]
    coords_normalized: np.ndarray  # [Tm, H, W, 3]
    colors: np.ndarray            # [H, W, 3]
    vis: Optional[np.ndarray]     # [T, H, W] or None


def load_vae_flow_sample(pkl_path: str, height: int = 384,
                         width: int = 512,
                         max_frames: int = 17) -> VAEFlowSample:
    with open(pkl_path, "rb") as f:
        data = pickle.load(f)
    coords = np.asarray(data["coords"], np.float32)
    if coords.ndim == 4 and coords.shape[0] == 1:
        coords = coords[0]
    t = coords.shape[0]
    coords = coords.reshape(t, height, width, 3)

    colors = np.asarray(data["colors"], np.float32)
    if colors.ndim == 3 and colors.shape[0] == 1:
        colors = colors[0]
    colors = colors.reshape(height, width, 3)

    delta = coords - coords[0:1]
    cm = coords[:max_frames]
    normalized = cm / max(np.abs(cm).max(), 1e-12)

    vis = None
    if "vis" in data:
        vis = np.asarray(data["vis"], np.float32).reshape(-1, height, width)

    return VAEFlowSample(coords=coords, coords_delta=delta.astype(np.float32),
                         coords_normalized=normalized.astype(np.float32),
                         colors=colors, vis=vis)


def normalize_vae_target(sample: VAEFlowSample, mode: str,
                         num_frames: int = 17,
                         height: int = 368, width: int = 512,
                         h_ori: int = 720, w_ori: int = 960) -> np.ndarray:
    """The four normalization strategies of train_vae.py:117-170 ->
    training target [T, H, W, 3].

    - 'track':             coords_normalized (global abs-max)
    - 'track_first_frame': coords_delta / max first-frame extent
    - 'track_z':           depth-guided (geometry.normalize_with_depth)
    - 'delta' (default):   coords - coords[0]
    """
    import jax.numpy as jnp

    if mode == "track":
        return sample.coords_normalized[:num_frames]
    if mode == "track_first_frame":
        frame0 = sample.coords[0].reshape(-1, 3)
        diff = float((frame0.max(0) - frame0.min(0)).max())
        diff = diff if diff != 0 else 1.0
        return (sample.coords_delta[:num_frames] / diff).astype(np.float32)
    if mode == "track_z":
        from ..geometry.normalize import normalize_with_depth

        flow = jnp.asarray(sample.coords[:num_frames])[None]
        return np.asarray(normalize_with_depth(
            flow, h_ori=h_ori, w_ori=w_ori))[0].astype(np.float32)
    if mode == "delta":
        return sample.coords_delta[:num_frames]
    raise ValueError(f"unknown normalization mode {mode}")


class VAEFlowDataset:
    """Iterates VAEFlowSamples from a video-list file (vae_dataset.py:28)."""

    def __init__(self, video_column: str, posfix: str = "",
                 data_root: Optional[str] = None, height: int = 384,
                 width: int = 512, max_frames: int = 17):
        self.paths = sceneflow_paths_from_list(video_column, posfix,
                                               data_root)
        self.height, self.width = height, width
        self.max_frames = max_frames

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> VAEFlowSample:
        return load_vae_flow_sample(self.paths[idx], self.height,
                                    self.width, self.max_frames)

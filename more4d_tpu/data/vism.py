"""ViSM training-pair assembly (host-side numpy).

Re-implements the ViSMDataset path of MoRe4D/data/wan_dataset.py:315-688:

- ``project_point_cloud``: per-frame point-cloud projection with normalized
  intrinsics (cx = cy = 0.5, fx/fy from the source/target aspect ratio,
  :406-431), z-buffer resolve by per-pixel min depth (``index_reduce_
  'amin'``) and mean color over min-depth ties (``torch_scatter scatter
  'mean'``) (:433-470), column-major pixel index x*H + y with the final
  reshape(W, H).T quirk — reproduced exactly;
- the pre-rendered path reading ``*_dt3d_render.mp4`` + ``*_mask_render.mp4``
  (:493-516), binary mask = any-channel > 0;
- frame sampling with stride 2 beyond max frames, last-frame padding
  (:517-538);
- inpaint sample assembly: ``mask_pixel_values = projected*(1-mask) - mask``,
  first-frame clip image (:667-679), text dropout;
- ``t2v_flag`` dropout: samples whose mask is all-ones (pure t2v) keep their
  inpaint conditioning zeroed with p=0.90 (4D_ViSM_training/train.py:
  1600-1605) — applied by the trainer via ``t2v_keep_flag``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


def vism_intrinsics(h: int, w: int, h_ori: float = 540.0,
                    w_ori: float = 960.0) -> np.ndarray:
    """Normalized pinhole intrinsics (wan_dataset.py:412-423): fx/fy chosen
    so the source aspect (540x960 reference) maps into the target frame.

    Reference condition is W_ori/W > H_ori/H -> fx = 1 (the width axis is
    the tighter fit); at the 540x960 -> 368x512 default this gives
    (fx, fy) = (1, 1.2784)."""
    if w_ori / w > h_ori / h:
        fx = 1.0
        fy = (w_ori / h_ori) / (w / h)
    else:
        fy = 1.0
        fx = (h_ori / w_ori) / (h / w)
    return np.array([[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1]], np.float32)


def project_point_cloud(coords: np.ndarray, colors: np.ndarray, h: int,
                        w: int, intrinsic: Optional[np.ndarray] = None,
                        extrinsic: Optional[np.ndarray] = None,
                        backend: str = "auto"
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """coords [N,3] camera-space, colors [N,3] -> (color_image [H,W,3],
    mask_image [H,W,3] with 1 = hole). Exact z-buffer semantics of
    wan_dataset.py:433-470: min depth wins, mean color over ties.

    backend 'auto' uses the compiled native core (more4d_tpu/native) when
    available — ~10x the numpy path for 188k-point frames — falling back
    to numpy ('numpy' forces the fallback; both are parity-tested)."""
    intrinsic = vism_intrinsics(h, w) if intrinsic is None else intrinsic
    if extrinsic is not None:
        pts = coords @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    else:
        pts = coords

    if backend == "auto":
        from .. import native

        if native.available():
            return native.zbuffer_project_native(
                np.asarray(pts, np.float32),
                np.asarray(colors, np.float32), h, w, intrinsic)
    depth = pts[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        uv = pts[:, :2] / np.maximum(depth[:, None], 1e-12)
    u = intrinsic[0, 0] * uv[:, 0] + intrinsic[0, 2]
    v = intrinsic[1, 1] * uv[:, 1] + intrinsic[1, 2]

    mask = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (depth >= 0)
    if not mask.any():
        color = np.zeros((h, w, 3), np.float32)
        return color, np.ones((h, w, 3), np.float32)

    cp = colors[mask].astype(np.float64)
    dp = depth[mask]
    # column-major flat index: floor(u*W) * H + floor(v*H)  (:450-452)
    ix = np.clip(np.floor(u[mask] * w), 0, w - 1)
    iy = np.clip(np.floor(v[mask] * h), 0, h - 1)
    idx = (ix * h + iy).astype(np.int64)

    # min depth per pixel (index_reduce_ 'amin', :456-459)
    order = np.argsort(idx, kind="stable")
    idx_s, dp_s, cp_s = idx[order], dp[order], cp[order]
    uniq, inverse = np.unique(idx_s, return_inverse=True)
    min_depth = np.full(len(uniq), dp.max(), dp.dtype)
    np.minimum.at(min_depth, inverse, dp_s)
    keep = dp_s == min_depth[inverse]

    # mean color over the min-depth survivors (scatter 'mean', :465)
    flat = np.zeros((h * w, 3), np.float64)
    count = np.zeros(h * w, np.float64)
    np.add.at(flat, idx_s[keep], cp_s[keep])
    np.add.at(count, idx_s[keep], 1.0)
    nz = count > 0
    flat[nz] /= count[nz, None]

    # reshape(W, H, 3).transpose(0, 1) quirk (:469)
    color = flat.reshape(w, h, 3).transpose(1, 0, 2).astype(np.float32)
    hole = (color.sum(axis=2) == 0).astype(np.float32)
    return color, np.repeat(hole[..., None], 3, axis=-1)


def sample_frame_indices(n_available: int, max_num_frames: int):
    """Stride-2 sampling beyond the budget, else all (:522-527).

    Indices are clamped to n_available-1: for max < n < 2*max the raw
    stride-2 range would index past the clip (the reference's decord
    get_batch tolerates this silently; a numpy fancy-index would raise), so
    out-of-range picks repeat the last frame instead."""
    if n_available > max_num_frames:
        idx = list(range(0, max_num_frames * 2, 2))[:max_num_frames]
        return [min(i, n_available - 1) for i in idx]
    return list(range(n_available))


def pad_frames(frames: np.ndarray, max_num_frames: int) -> np.ndarray:
    """Last-frame padding to the budget (:533-537)."""
    if frames.shape[0] >= max_num_frames:
        return frames[:max_num_frames]
    pad = np.repeat(frames[-1:], max_num_frames - frames.shape[0], axis=0)
    return np.concatenate([frames, pad], axis=0)


@dataclasses.dataclass
class ViSMSample:
    pixel_values: np.ndarray        # [T,H,W,3] original video in [-1,1]
    projected_images: np.ndarray    # [T,H,W,3] rendered/projected, [-1,1]
    mask: np.ndarray                # [T,H,W,3] 1 = hole
    mask_pixel_values: np.ndarray   # [T,H,W,3] projected*(1-m) - m
    clip_image01: np.ndarray        # [H,W,3] first original frame in [0,1]
    text: str
    t2v_keep_flag: float            # 0 -> zero the inpaint conditioning


def prepare_vism_sample(video01: np.ndarray, text: str,
                        coords: Optional[np.ndarray] = None,
                        colors: Optional[np.ndarray] = None,
                        prerendered: Optional[np.ndarray] = None,
                        prerendered_mask: Optional[np.ndarray] = None,
                        max_num_frames: int = 49,
                        text_dropout: float = 0.1,
                        t2v_dropout: float = 0.9,
                        rng: Optional[np.random.RandomState] = None
                        ) -> ViSMSample:
    """Build one inpaint training pair.

    video01: [T,H,W,3] original frames in [0,1]. Either (coords [T,N,3] +
    colors [N,3] in [0,1]) for the live-projection path, or
    (prerendered [T,H,W,3] in [0,1] + prerendered_mask [T,H,W] or
    [T,H,W,3]) for the 3DGS path (use_3dgs)."""
    rng = rng or np.random.RandomState()
    t, h, w, _ = video01.shape

    if prerendered is not None:
        proj = pad_frames(np.asarray(prerendered, np.float32),
                          max_num_frames)
        m = np.asarray(prerendered_mask, np.float32)
        if m.ndim == 3:
            m = np.repeat(m[..., None], 3, axis=-1)
        # binary: any channel lit (:509-512)
        m = (m.sum(axis=-1, keepdims=True) > 0).astype(np.float32)
        m = np.repeat(m, 3, axis=-1)
        mask = pad_frames(m, max_num_frames)
    else:
        assert coords is not None and colors is not None
        frames, masks = [], []
        for i in range(min(coords.shape[0], max_num_frames)):
            color, hole = project_point_cloud(coords[i], colors, h, w)
            frames.append(color)
            masks.append(hole)
        proj = pad_frames(np.stack(frames), max_num_frames)
        mask = pad_frames(np.stack(masks), max_num_frames)

    video = pad_frames(np.asarray(video01, np.float32),
                       max_num_frames) * 2.0 - 1.0
    proj = proj * 2.0 - 1.0

    # mask_pixel_values = proj*(1-mask) + (-1)*mask (:673-675)
    mask_px = proj * (1.0 - mask) - mask

    if rng.rand() < text_dropout:
        text = ""
    # t2v dropout (train.py:1600-1605): all-hole samples keep conditioning
    # zeroed 90% of the time
    all_hole = bool((mask >= 1.0 - 1e-6).all())
    keep = 0.0 if (all_hole and rng.rand() < t2v_dropout) else 1.0

    return ViSMSample(
        pixel_values=video.astype(np.float32),
        projected_images=proj.astype(np.float32),
        mask=mask.astype(np.float32),
        mask_pixel_values=mask_px.astype(np.float32),
        clip_image01=(video[0] * 0.5 + 0.5).astype(np.float32),
        text=text,
        t2v_keep_flag=keep)


def load_prerendered(video_path: str, max_num_frames: int = 49,
                     size: Optional[Tuple[int, int]] = None):
    """Read the pre-rendered pair ``*_dt3d_render.mp4`` / ``*_mask_render
    .mp4`` for a clip (wan_dataset.py:493-516 path convention)."""
    from ..utils.artifacts import read_video_frames

    render_path = video_path.replace("videos", "dt3d_render").replace(
        ".mp4", "_dt3d_render.mp4")
    mask_path = video_path.replace("videos", "dt3d_render").replace(
        ".mp4", "_mask_render.mp4")
    render = read_video_frames(render_path, size=size)
    idx = sample_frame_indices(render.shape[0], max_num_frames)
    render = render[idx]
    mask = read_video_frames(mask_path, size=size)[idx]
    return render, mask

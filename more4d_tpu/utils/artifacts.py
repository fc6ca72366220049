"""Artifact IO: video grid writers, video/mask readers, pointcloud txt.

Host-side equivalents of the reference's artifact utilities:

- ``save_videos_grid``     <- MoRe4D/utils/utils.py:55-80 (imageio mimsave);
  gif written via imageio, mp4 via cv2 (no ffmpeg binary in this image).
- ``read_video_frames`` /
  ``read_mask_video``      <- utils.py:274-362 ``get_video_to_video_latent``
  video + validation-video-mask reading (decord there; cv2 here).
- ``save_pointcloud_txt`` /
  ``load_pointcloud_txt``  <- scripts/inference/infer.py:447-490.

All functions take/return numpy arrays in [0, 1] float or uint8, channel-last
— the framework's host-side convention.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def make_grid(videos: np.ndarray, n_rows: int = 1,
              pad_value: float = 0.0) -> np.ndarray:
    """[B, T, H, W, 3] -> [T, H*rows, W*cols, 3] tiled grid (the torchvision
    make_grid step of save_videos_grid, utils.py:58-63)."""
    b, t, h, w, c = videos.shape
    cols = int(np.ceil(b / n_rows))
    canvas = np.full((t, n_rows * h, cols * w, c), pad_value,
                     videos.dtype)
    for i in range(b):
        r, col = divmod(i, cols)
        canvas[:, r * h:(r + 1) * h, col * w:(col + 1) * w] = videos[i]
    return canvas


def save_videos_grid(path: str, videos: np.ndarray, fps: int = 8,
                     n_rows: int = 1) -> None:
    """videos [B, T, H, W, 3] float in [0, 1] (or uint8) -> .gif/.mp4 grid."""
    if videos.ndim == 4:
        videos = videos[None]
    if videos.dtype != np.uint8:
        videos = (np.clip(videos, 0.0, 1.0) * 255).astype(np.uint8)
    grid = make_grid(videos, n_rows=n_rows)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gif":
        import imageio

        imageio.mimwrite(path, grid, duration=1000.0 / fps, loop=0)
    elif ext in (".mp4", ".avi", ".mkv"):
        import cv2

        t, h, w, _ = grid.shape
        fourcc = cv2.VideoWriter_fourcc(*("mp4v" if ext == ".mp4"
                                          else "XVID"))
        vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
        if not vw.isOpened():
            raise IOError(f"cv2.VideoWriter failed to open {path}")
        for frame in grid:
            vw.write(frame[:, :, ::-1])  # RGB -> BGR
        vw.release()
    else:
        raise ValueError(f"unsupported video extension: {ext}")


def read_video_frames(path: str, num_frames: Optional[int] = None,
                      size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Read a video -> [T, H, W, 3] float32 in [0, 1]; optionally limit the
    frame count and resize to (height, width). cv2 replaces the reference's
    decord VideoReader (utils.py:288-299)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    frames = []
    while num_frames is None or len(frames) < num_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frame = frame[:, :, ::-1]  # BGR -> RGB
        if size is not None:
            frame = cv2.resize(frame, (size[1], size[0]),
                               interpolation=cv2.INTER_LINEAR)
        frames.append(frame)
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.asarray(frames, np.float32) / 255.0


def read_mask_video(path: str, num_frames: Optional[int] = None,
                    size: Optional[Tuple[int, int]] = None,
                    threshold: float = 0.5) -> np.ndarray:
    """Read a mask video -> [T, H, W] float32 in {0, 1} (1 = hole to
    inpaint), the validation_video_mask path of utils.py:300-322."""
    frames = read_video_frames(path, num_frames, size)
    grey = frames.mean(axis=-1)
    return (grey > threshold).astype(np.float32)


def save_pointcloud_txt(path: str, coords: np.ndarray,
                        colors: Optional[np.ndarray] = None) -> None:
    """coords [N, 3] (+ colors [N, 3] in [0, 1]) -> 'x y z [r g b]' rows
    (save_point_cloud_to_txt, infer.py:447-467)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if colors is not None:
        data = np.concatenate(
            [coords, np.clip(colors, 0, 1) * 255.0], axis=1)
        np.savetxt(path, data, fmt="%.6f %.6f %.6f %.0f %.0f %.0f")
    else:
        np.savetxt(path, coords, fmt="%.6f")


def load_pointcloud_txt(path: str) -> Tuple[np.ndarray,
                                            Optional[np.ndarray]]:
    """Inverse of save_pointcloud_txt (load_point_cloud_from_txt,
    infer.py:470-490). Returns (coords [N,3], colors [N,3] in [0,1] or
    None)."""
    data = np.loadtxt(path, dtype=np.float64)
    if data.ndim == 1:
        data = data[None]
    coords = data[:, :3].astype(np.float32)
    colors = None
    if data.shape[1] >= 6:
        colors = (data[:, 3:6] / 255.0).astype(np.float32)
    return coords, colors

"""Monocular depth providers for the stage-1 point lift.

The reference calls ``UniDepthV2old.infer(image)['depth']``
(scripts/inference/infer.py:47, 515-520, 818) — a third-party CUDA/xFormers
model installed from github (README:59) whose code is *not* part of the
MoRe4D snapshot. Only the depth map is consumed, so the framework treats
depth as a provider interface:

- ``unidepth_jax``            — the native JAX UniDepth-V2 port
  (models/unidepth.py: DINOv2 ViT-L/14 backbone golden-tested vs
  transformers, camera-token pinhole head, SH ray-prompted depth decoder);
- ``PrecomputedDepthProvider`` — .npy/.npz depth maps saved offline;
- ``TorchUniDepthProvider``   — wraps an installed ``unidepth`` package on
  the host (CPU/GPU), when available;
- ``ConstantDepthProvider``   — tests/debug.
"""

from __future__ import annotations

import os
from typing import Optional, Protocol

import numpy as np


class DepthProvider(Protocol):
    def __call__(self, image01: np.ndarray) -> np.ndarray:
        """image01: [H, W, 3] float in [0,1] -> depth [H, W] float32."""
        ...


class ConstantDepthProvider:
    def __init__(self, depth: float = 2.0):
        self.depth = depth

    def __call__(self, image01):
        return np.full(image01.shape[:2], self.depth, np.float32)


class PrecomputedDepthProvider:
    """Loads ``<name>.npy`` depth maps from a directory; the image's
    provenance is communicated via set_current(name)."""

    def __init__(self, directory: str):
        self.directory = directory
        self._current: Optional[str] = None

    def set_current(self, name: str):
        self._current = name

    def __call__(self, image01):
        assert self._current is not None, "call set_current(name) first"
        path = os.path.join(self.directory, self._current + ".npy")
        depth = np.load(path).astype(np.float32)
        return depth


class TorchUniDepthProvider:
    """Runs UniDepthV2 via the torch package when installed (host-side)."""

    def __init__(self, model_name: str = "unidepth-v2-vitl14"):
        import torch
        from unidepth.models import UniDepthV2  # noqa: F401 (optional dep)

        self.torch = torch
        self.model = UniDepthV2.from_pretrained(
            f"lpiccinelli/{model_name}")
        self.model.eval()

    def __call__(self, image01):
        t = self.torch.from_numpy(
            np.transpose(image01 * 255.0, (2, 0, 1)).astype(np.uint8))
        with self.torch.no_grad():
            out = self.model.infer(t)
        return out["depth"].squeeze().cpu().numpy().astype(np.float32)


def get_depth_provider(kind: str, **kw) -> DepthProvider:
    if kind == "constant":
        return ConstantDepthProvider(**kw)
    if kind == "precomputed":
        return PrecomputedDepthProvider(**kw)
    if kind == "unidepth":
        return TorchUniDepthProvider(**kw)
    if kind == "unidepth_jax":
        from .unidepth import JaxUniDepthProvider

        return JaxUniDepthProvider(**kw)
    raise ValueError(f"unknown depth provider {kind}")

"""3-axis rotary position embeddings for video DiTs (+ RIFLEx extension).

The Wan DiT splits each attention head's channel pairs into three groups that
rotate with the temporal / height / width token coordinate respectively
(rope_params + rope_apply, wan_transformer4d.py:252-375). We precompute angle
tables per axis and materialise a per-token (cos, sin) grid for a static
(f, h, w) latent grid; padding / extra tokens get the identity rotation.

RIFLEx (wan_transformer4d.py:262-320, enable_riflex :1011-1026) lowers the
temporal intrinsic frequency k so frame-count extrapolation stays within one
period: freqs[k-1] = 0.9 * 2*pi / L_test (optionally divided by L_test_scale).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _axis_angles(max_pos: int, dim_axis: int, theta: float = 10000.0,
                 riflex_k: Optional[int] = None,
                 riflex_l_test: Optional[int] = None,
                 riflex_scale: Optional[float] = None) -> np.ndarray:
    """Angle table [max_pos, dim_axis//2] for one coordinate axis (float64)."""
    assert dim_axis % 2 == 0
    freqs = 1.0 / np.power(theta, np.arange(0, dim_axis, 2, dtype=np.float64)
                           / dim_axis)
    if riflex_k is not None:
        assert riflex_l_test is not None
        freqs[riflex_k - 1] = 0.9 * 2.0 * np.pi / riflex_l_test
        if riflex_scale is not None:
            freqs[riflex_k - 1] = freqs[riflex_k - 1] / riflex_scale
    return np.outer(np.arange(max_pos, dtype=np.float64), freqs)


@dataclasses.dataclass(frozen=True)
class RopeTables:
    """Host-side per-axis angle tables. Cheap to build; cached per config."""

    t: np.ndarray  # [max_pos, dt/2]
    h: np.ndarray  # [max_pos, dh/2]
    w: np.ndarray  # [max_pos, dw/2]

    @classmethod
    def create(cls, head_dim: int, max_pos: int = 1024, theta: float = 10000.0,
               riflex_k: Optional[int] = None,
               riflex_l_test: Optional[int] = None,
               riflex_scale: Optional[float] = None) -> "RopeTables":
        d = head_dim
        dt, dh, dw = d - 4 * (d // 6), 2 * (d // 6), 2 * (d // 6)
        return cls(
            t=_axis_angles(max_pos, dt, theta, riflex_k, riflex_l_test,
                           riflex_scale),
            h=_axis_angles(max_pos, dh, theta),
            w=_axis_angles(max_pos, dw, theta),
        )


def rope_angles_3d(tables: RopeTables, grid: Tuple[int, int, int],
                   seq_len: Optional[int] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) [seq_len, head_dim//2] float32 for a (f, h, w) token grid.

    Token order is row-major over (f, h, w) — matching the patchify flatten in
    wan_transformer4d.py:1082. Channel-pair order is [t-pairs | h-pairs |
    w-pairs] (rope_apply's freqs split, :346). Tokens beyond f*h*w (padding,
    trailing refs) receive the identity rotation, matching the reference which
    leaves `x[i, seq_len:]` unrotated (:365).
    """
    f, h, w = grid
    ang = np.concatenate([
        np.broadcast_to(tables.t[:f][:, None, None, :],
                        (f, h, w, tables.t.shape[1])),
        np.broadcast_to(tables.h[:h][None, :, None, :],
                        (f, h, w, tables.h.shape[1])),
        np.broadcast_to(tables.w[:w][None, None, :, :],
                        (f, h, w, tables.w.shape[1])),
    ], axis=-1).reshape(f * h * w, -1)
    cos = np.cos(ang).astype(np.float32)
    sin = np.sin(ang).astype(np.float32)
    if seq_len is not None and seq_len > f * h * w:
        pad = seq_len - f * h * w
        cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), np.float32)])
        sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), np.float32)])
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate q/k by precomputed angles.

    x: [B, L, H, D]; cos/sin: [L, D//2] (identity rows for padded tokens).
    Pairs are consecutive (even, odd) channels — torch.view_as_complex
    semantics on a [..., d/2, 2] reshape (wan_transformer4d.py:354). Rotation
    runs in float32 and casts back; the reference runs rope_apply under
    autocast(enabled=False) in fp32 (:340).
    """
    dtype = x.dtype
    b, l, n, d = x.shape
    xr = x.astype(jnp.float32).reshape(b, l, n, d // 2, 2)
    xe, xo = xr[..., 0], xr[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    oe = xe * c - xo * s
    oo = xe * s + xo * c
    return jnp.stack([oe, oo], axis=-1).reshape(b, l, n, d).astype(dtype)

"""ViSM + VAE-flow data pipelines vs the reference's torch semantics
(wan_dataset.py:315-688, vae_dataset.py:14-67)."""

import os
import pickle

import numpy as np
import pytest

from more4d_tpu.data.vae_flow import (VAEFlowDataset, load_vae_flow_sample,
                                      sceneflow_paths_from_list)
from more4d_tpu.data.vism import (pad_frames, prepare_vism_sample,
                                  project_point_cloud, sample_frame_indices,
                                  vism_intrinsics)

H, W = 24, 32


def _torch_reference_projection(coords, colors, h, w):
    """Literal re-implementation of wan_dataset.py:433-470 semantics in
    torch (index_reduce_ amin + scatter mean + reshape(W,H).T)."""
    import torch

    intr = torch.from_numpy(vism_intrinsics(h, w))
    pts = torch.from_numpy(coords)
    cols = torch.from_numpy(colors)
    depth = pts[:, 2]
    uv = pts[:, :2] / torch.clamp(depth[:, None], min=1e-12)
    u = intr[0, 0] * uv[:, 0] + intr[0, 2]
    v = intr[1, 1] * uv[:, 1] + intr[1, 2]
    mask = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (depth >= 0)
    if mask.sum() == 0:
        return (np.zeros((h, w, 3), np.float32),
                np.ones((h, w, 3), np.float32))
    cp = cols[mask]
    dp = depth[mask]
    idx = (torch.clamp((u[mask] * w).floor(), 0, w - 1) * h
           + torch.clamp((v[mask] * h).floor(), 0, h - 1)).long()
    uniq, inverse = torch.unique(idx, return_inverse=True)
    min_depth = torch.ones_like(uniq, dtype=dp.dtype) * dp.max()
    min_depth.index_reduce_(0, inverse, dp, "amin")
    keep = dp == min_depth[inverse]
    cp, idx = cp[keep], idx[keep]
    # scatter mean without torch_scatter
    out = torch.zeros((h * w, 3), dtype=torch.float64)
    cnt = torch.zeros(h * w, dtype=torch.float64)
    out.index_add_(0, idx, cp.double())
    cnt.index_add_(0, idx, torch.ones_like(idx, dtype=torch.float64))
    nz = cnt > 0
    out[nz] /= cnt[nz, None]
    color = out.reshape(w, h, 3).transpose(0, 1).float().numpy()
    hole = (color.sum(axis=2) == 0).astype(np.float32)
    return color, np.repeat(hole[..., None], 3, -1)


def test_projection_matches_torch_reference():
    rs = np.random.RandomState(0)
    n = 4000
    coords = np.stack([rs.uniform(-0.4, 0.4, n), rs.uniform(-0.3, 0.3, n),
                       rs.uniform(0.5, 3.0, n)], -1).astype(np.float32)
    # inject exact-duplicate pixels with equal min depth (mean-tie path)
    coords[100] = coords[101] = [0.05, 0.05, 1.0]
    colors = rs.rand(n, 3).astype(np.float32)

    got_c, got_m = project_point_cloud(coords, colors, H, W)
    ref_c, ref_m = _torch_reference_projection(coords, colors, H, W)
    np.testing.assert_allclose(got_c, ref_c, atol=1e-5)
    np.testing.assert_array_equal(got_m, ref_m)


def test_projection_empty_and_behind():
    coords = np.array([[0.0, 0.0, -1.0], [5.0, 5.0, 1.0]], np.float32)
    colors = np.ones((2, 3), np.float32)
    c, m = project_point_cloud(coords, colors, H, W)
    assert (c == 0).all() and (m == 1).all()


def test_vism_intrinsics_reference_values():
    """Hand-computed against wan_dataset.py:412-423 (the branch selects on
    W_ori/W > H_ori/H). At the 540x960 -> 368x512 default the width axis is
    tighter, so fx = 1 and fy = (960/540)/(512/368) = 1.27836..."""
    intr = vism_intrinsics(368, 512)
    assert intr[0, 0] == pytest.approx(1.0)
    assert intr[1, 1] == pytest.approx((960.0 / 540.0) / (512.0 / 368.0))
    # opposite branch: target much wider than source -> fy = 1
    intr2 = vism_intrinsics(512, 2048)
    assert intr2[1, 1] == pytest.approx(1.0)
    assert intr2[0, 0] == pytest.approx((540.0 / 960.0) / (512.0 / 2048.0))
    # square source into square target -> identity-ish (both branches agree)
    intr3 = vism_intrinsics(512, 512, h_ori=512, w_ori=512)
    assert intr3[0, 0] == pytest.approx(1.0)
    assert intr3[1, 1] == pytest.approx(1.0)


def test_frame_sampling_and_padding():
    assert sample_frame_indices(100, 49) == list(range(0, 98, 2))
    assert sample_frame_indices(10, 49) == list(range(10))
    # max < n < 2*max: raw stride-2 indices would run past the clip; they
    # are clamped to the last frame instead of raising
    idx = sample_frame_indices(60, 49)
    assert len(idx) == 49 and max(idx) == 59
    assert idx[:30] == list(range(0, 60, 2))
    assert all(i == 59 for i in idx[30:])
    f = np.arange(5)[:, None, None, None] * np.ones((5, 2, 2, 3))
    padded = pad_frames(f, 8)
    assert padded.shape[0] == 8
    assert (padded[5:] == padded[4]).all()


def test_prepare_vism_sample_projection_path():
    rs = np.random.RandomState(1)
    t = 5
    coords = np.stack([rs.uniform(-0.3, 0.3, (t, 500)),
                       rs.uniform(-0.2, 0.2, (t, 500)),
                       rs.uniform(0.5, 2.0, (t, 500))], -1).astype(np.float32)
    colors = rs.rand(500, 3).astype(np.float32)
    video = rs.rand(t, H, W, 3).astype(np.float32)
    s = prepare_vism_sample(video, "a scene", coords=coords, colors=colors,
                            max_num_frames=9, text_dropout=0.0,
                            rng=np.random.RandomState(0))
    assert s.pixel_values.shape == (9, H, W, 3)
    assert s.projected_images.shape == (9, H, W, 3)
    assert s.mask.shape == (9, H, W, 3)
    assert s.mask_pixel_values.shape == (9, H, W, 3)
    # holes are exactly -1 in mask_pixel_values (:673-675)
    hole = s.mask > 0.5
    np.testing.assert_allclose(s.mask_pixel_values[hole], -1.0)
    keep = ~hole
    np.testing.assert_allclose(s.mask_pixel_values[keep],
                               s.projected_images[keep], atol=1e-6)
    assert s.text == "a scene" and s.t2v_keep_flag == 1.0
    np.testing.assert_allclose(s.clip_image01,
                               (s.pixel_values[0] + 1) / 2, atol=1e-6)


def test_prepare_vism_sample_t2v_dropout():
    rs = np.random.RandomState(2)
    video = rs.rand(3, H, W, 3).astype(np.float32)
    all_hole = np.ones((3, H, W, 3), np.float32)
    flags = []
    for seed in range(50):
        s = prepare_vism_sample(video, "x", prerendered=np.zeros_like(video),
                                prerendered_mask=all_hole, max_num_frames=3,
                                text_dropout=0.0,
                                rng=np.random.RandomState(seed))
        flags.append(s.t2v_keep_flag)
    # ~90% of all-hole samples have conditioning zeroed (train.py:1600-1605)
    assert 0.75 < np.mean(np.asarray(flags) == 0.0) <= 1.0
    # non-all-hole samples always keep conditioning
    some_hole = all_hole.copy()
    some_hole[:, :5] = 0
    s = prepare_vism_sample(video, "x", prerendered=np.zeros_like(video),
                            prerendered_mask=some_hole, max_num_frames=3,
                            text_dropout=0.0, rng=np.random.RandomState(0))
    assert s.t2v_keep_flag == 1.0


def test_vae_flow_dataset(tmp_path):
    rs = np.random.RandomState(3)
    t = 6
    os.makedirs(tmp_path / "dt3d", exist_ok=True)
    for i in range(2):
        coords = rs.randn(t, H * W, 3).astype(np.float32) * 2
        pkl = {"coords": coords,
               "colors": rs.rand(H * W, 3).astype(np.float32),
               "vis": rs.randint(0, 2, (t, H * W)).astype(np.float32)}
        with open(tmp_path / "dt3d" / f"clip{i}_dt3d_pred.pkl", "wb") as f:
            pickle.dump(pkl, f)
    with open(tmp_path / "list.txt", "w") as f:
        f.write("videos/clip0.mp4\nvideos/clip1.mp4\n\n")

    paths = sceneflow_paths_from_list(str(tmp_path / "list.txt"))
    assert len(paths) == 2 and paths[0].endswith("dt3d/clip0_dt3d_pred.pkl")

    ds = VAEFlowDataset(str(tmp_path / "list.txt"), height=H, width=W,
                        max_frames=4)
    s = ds[0]
    assert s.coords.shape == (t, H, W, 3)
    assert s.coords_delta.shape == (t, H, W, 3)
    np.testing.assert_allclose(s.coords_delta[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(s.coords_delta[3],
                               s.coords[3] - s.coords[0], atol=1e-6)
    assert s.coords_normalized.shape == (4, H, W, 3)
    assert abs(np.abs(s.coords_normalized).max() - 1.0) < 1e-6
    assert s.vis.shape == (t, H, W)

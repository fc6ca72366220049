"""Artifact IO: video grid writers / readers, mask videos, pointcloud txt
(reference utils.py:55-80, 274-362; infer.py:447-490)."""

import numpy as np
import pytest

from more4d_tpu.utils import (load_pointcloud_txt, make_grid,
                              read_mask_video, read_video_frames,
                              save_pointcloud_txt, save_videos_grid)


def test_make_grid_tiles():
    videos = np.zeros((3, 2, 4, 5, 3), np.float32)
    videos[1] = 1.0
    grid = make_grid(videos, n_rows=2)
    assert grid.shape == (2, 8, 10, 3)
    assert grid[:, :4, 5:10].max() == 1.0  # sample 1 -> row 0, col 1
    assert grid[:, 4:, 5:10].max() == 0.0  # empty cell


@pytest.mark.parametrize("ext", [".mp4", ".gif"])
def test_save_videos_grid_roundtrip(tmp_path, ext):
    rs = np.random.RandomState(0)
    video = rs.rand(1, 5, 32, 48, 3).astype(np.float32)
    path = str(tmp_path / f"v{ext}")
    save_videos_grid(path, video, fps=8)
    if ext == ".gif":
        import imageio

        frames = np.asarray(imageio.mimread(path))
        assert frames.shape[0] == 5
    else:
        frames = read_video_frames(path)
        assert frames.shape == (5, 32, 48, 3)
        # mp4v is lossy; just check gross correlation
        assert abs(frames.mean() - video.mean()) < 0.1


def test_read_mask_video(tmp_path):
    mask = np.zeros((4, 32, 32, 3), np.float32)
    mask[:, 8:24, 8:24] = 1.0
    path = str(tmp_path / "m.mp4")
    save_videos_grid(path, mask[None], fps=8)
    got = read_mask_video(path)
    assert got.shape == (4, 32, 32)
    inner = got[:, 12:20, 12:20]
    outer = got[:, :4, :4]
    assert inner.mean() > 0.9 and outer.mean() < 0.1


def test_pointcloud_txt_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    coords = rs.randn(17, 3).astype(np.float32)
    colors = rs.rand(17, 3).astype(np.float32)
    path = str(tmp_path / "pc.txt")
    save_pointcloud_txt(path, coords, colors)
    c2, col2 = load_pointcloud_txt(path)
    np.testing.assert_allclose(c2, coords, atol=1e-5)
    np.testing.assert_allclose(col2, colors, atol=1 / 255.0 + 1e-6)


def test_profiling_timer_and_trace(tmp_path, capsys):
    """utils/profiling: the timer decorator syncs and prints wall time
    (reference timer/timer_record, utils.py:407-466); trace() writes a
    jax.profiler capture directory."""
    import jax.numpy as jnp

    from more4d_tpu.utils.profiling import timer, trace

    @timer("unit")
    def f(x):
        return jnp.sum(x * 2)

    out = f(jnp.ones((8, 8)))
    assert float(out) == 128.0
    assert "[timer] unit:" in capsys.readouterr().out

    d = str(tmp_path / "trace")
    with trace(d):
        float(jnp.sum(jnp.ones((4, 4))))
    import os

    found = [f for _, _, fs in os.walk(d) for f in fs]
    assert found, "no profiler capture written"

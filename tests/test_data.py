"""Data pipeline: masks, sceneflow prep, resumable bucket sampling."""

import numpy as np
import pytest

from more4d_tpu.data import (AspectRatioBatchSampler, ResumableSampler,
                             closest_bucket, get_random_mask,
                             prepare_straag_sample)


def test_mask_shapes_and_values():
    rng = np.random.RandomState(0)
    for _ in range(30):
        m = get_random_mask((9, 16, 20), rng=rng)
        assert m.shape == (9, 16, 20, 1)
        assert m.dtype == np.uint8
        assert set(np.unique(m)).issubset({0, 1})


def test_mask_image_start_only():
    m = get_random_mask((5, 8, 8), image_start_only=True)
    assert m[0].sum() == 0 and (m[1:] == 1).all()


def test_prepare_straag_sample_shapes_and_normalization():
    rng = np.random.RandomState(1)
    t, h, w = 7, 8, 10
    coords = rng.randn(t, h, w, 3).astype(np.float32)
    coords[..., 2] += 5.0
    colors = rng.rand(h, w, 3).astype(np.float32) * 255

    s = prepare_straag_sample(coords, colors, max_num_frames=9)
    assert s.flow.shape == (9, h, w, 3)
    # first frame of the normalized flow is zero (delta from itself)
    np.testing.assert_allclose(s.flow[0], 0.0, atol=1e-6)
    # last frames padded by repeating frame 6
    np.testing.assert_allclose(s.flow[7], s.flow[6])
    assert s.control_video.shape == (9, h, w, 3)
    assert s.control_video.min() >= -1 and s.control_video.max() <= 1
    np.testing.assert_allclose(s.control_video[0], s.control_video[5])
    assert s.depth_image.shape == (1, h, w, 3)


def test_prepare_straag_large_depth_filter():
    coords = np.full((5, 4, 4, 3), 1000.0, np.float32)
    colors = np.zeros((4, 4, 3), np.float32)
    assert prepare_straag_sample(coords, colors, max_num_frames=5) is None


def test_resumable_sampler_state_roundtrip():
    s = ResumableSampler(10, seed=3)
    it = iter(s)
    first = [next(it) for _ in range(4)]
    state = s.state_dict()

    s2 = ResumableSampler(10, seed=3)
    s2.load_state_dict(state)
    it2 = iter(s2)
    rest2 = [next(it2) for _ in range(6)]
    rest1 = [next(it) for _ in range(6)]
    assert rest1 == rest2
    assert sorted(first + rest1) == list(range(10))


def test_bucket_batch_sampler_groups_by_ratio():
    ratios = [0.5, 0.5, 1.0, 1.0, 2.0, 2.0, 0.5, 1.0]
    s = ResumableSampler(len(ratios), seed=0, shuffle=False)
    bs = AspectRatioBatchSampler(s, ratios, batch_size=2)
    it = iter(bs)
    seen = []
    for _ in range(3):
        key, batch = next(it)
        seen.append((key, tuple(batch)))
        assert len({ratios[i] for i in batch}) == 1
    assert closest_bucket(512, 512) == "1.0"
    assert closest_bucket(256, 1024) == "0.25"

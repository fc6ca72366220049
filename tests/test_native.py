"""Native C++ z-buffer core vs the numpy implementation (which is itself
golden vs the literal torch reference in test_vism_data.py), plus the
threaded prefetch loader."""

import time

import numpy as np
import pytest

from more4d_tpu import native
from more4d_tpu.data.prefetch import PrefetchIterator, prefetch
from more4d_tpu.data.vism import project_point_cloud

H, W = 24, 32


@pytest.mark.skipif(not native.available(),
                    reason="g++ unavailable or build failed")
def test_native_matches_numpy():
    rs = np.random.RandomState(0)
    n = 50000
    coords = np.stack([rs.uniform(-0.4, 0.4, n), rs.uniform(-0.3, 0.3, n),
                       rs.uniform(0.5, 3.0, n)], -1).astype(np.float32)
    coords[10] = coords[11] = [0.03, 0.03, 1.0]   # exact min-depth tie
    coords[20, 2] = -1.0                           # behind camera
    colors = rs.rand(n, 3).astype(np.float32)

    c_np, m_np = project_point_cloud(coords, colors, H, W,
                                     backend="numpy")
    c_nat, m_nat = project_point_cloud(coords, colors, H, W,
                                       backend="auto")
    np.testing.assert_allclose(c_nat, c_np, atol=1e-5)
    np.testing.assert_array_equal(m_nat, m_np)


@pytest.mark.skipif(not native.available(),
                    reason="g++ unavailable or build failed")
def test_native_empty():
    coords = np.array([[0.0, 0.0, -1.0]], np.float32)
    colors = np.ones((1, 3), np.float32)
    c, m = project_point_cloud(coords, colors, H, W, backend="auto")
    assert (c == 0).all() and (m == 1).all()


def test_prefetch_order_independent_completeness():
    out = sorted(prefetch(iter(range(50)), depth=4, num_workers=3))
    assert out == list(range(50))


def test_prefetch_producer():
    it = PrefetchIterator(iter(range(20)), lambda x: x * x,
                          num_workers=2, depth=2)
    assert sorted(it) == [i * i for i in range(20)]


def test_prefetch_propagates_errors():
    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = PrefetchIterator(iter(range(10)), bad, num_workers=1, depth=2)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_overlaps_slow_producer():
    def slow(x):
        time.sleep(0.05)
        return x

    t0 = time.perf_counter()
    out = list(PrefetchIterator(iter(range(8)), slow, num_workers=4,
                                depth=8))
    dt = time.perf_counter() - t0
    assert len(out) == 8
    assert dt < 0.05 * 8 * 0.8, dt   # meaningfully faster than serial

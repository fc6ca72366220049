"""Point-splat renderer: z-buffer equivalence in the hard limit, occlusion,
differentiability."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from more4d_tpu.geometry.gaussians import gs_render
from more4d_tpu.geometry.render import zbuffer_render

INTR = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
EXT = jnp.eye(4)


def test_occlusion_front_point_wins():
    pts = jnp.asarray([[0.1, 0.1, 1.0], [0.1, 0.1, 2.0]])  # same ray
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img, alpha = gs_render(pts, cols, EXT, INTR, 8, 8, scale=1e-4,
                           tau=1e-4)
    # uv = 0.6 -> pixel (4, 4)
    px = np.asarray(img[4, 4])
    assert px[0] > 0.99 and px[1] < 0.01
    assert float(alpha[4, 4]) > 0.5


def test_matches_zbuffer_in_hard_limit():
    """Points at exact pixel centres: the splat renderer must agree with the
    z-buffer renderer (hard z-test, tiny sigma => no cross-pixel blending)."""
    h = w = 16
    rng = np.random.RandomState(0)
    # one point per pixel centre at depth 2 (uv = (i+0.5)/w)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    u = (xs.ravel() + 0.5) / w
    v = (ys.ravel() + 0.5) / h
    z = np.full(h * w, 2.0, np.float32)
    pts = np.stack([(u - 0.5) * z, (v - 0.5) * z, z], axis=-1)
    cols = rng.rand(h * w, 3).astype(np.float32)
    # an occluding point in front of pixel (3, 3)
    front = np.array([[(u[3 * w + 3] - 0.5), (v[3 * w + 3] - 0.5), 1.0]],
                     np.float32)
    pts = np.concatenate([pts, front])
    cols = np.concatenate([cols, np.ones((1, 3), np.float32)])

    img_gs, alpha = gs_render(jnp.asarray(pts), jnp.asarray(cols), EXT, INTR,
                              h, w, scale=1e-5, tau=1e-5)
    img_zb, hole = zbuffer_render(jnp.asarray(pts), jnp.asarray(cols), EXT,
                                  INTR, h, w)
    assert not np.asarray(hole).any()
    np.testing.assert_allclose(np.asarray(img_gs), np.asarray(img_zb),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(img_gs[3, 3]), [1, 1, 1],
                               atol=0.02)
    assert (np.asarray(alpha) > 0.5).all()


@pytest.mark.slow
def test_render_is_differentiable():
    pts = jnp.asarray([[0.05, 0.05, 1.2], [-0.1, 0.0, 1.8]])
    cols = jnp.asarray([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]])

    def loss(p, c):
        img, _ = gs_render(p, c, EXT, INTR, 8, 8, scale=0.01, tau=0.1)
        return jnp.sum(img ** 2)

    gp, gc = jax.grad(loss, argnums=(0, 1))(pts, cols)
    assert np.isfinite(np.asarray(gp)).all()
    assert np.abs(np.asarray(gc)).max() > 0


def test_empty_pixels_get_background():
    pts = jnp.asarray([[0.1, 0.1, 1.0]])
    cols = jnp.asarray([[1.0, 1.0, 1.0]])
    img, alpha = gs_render(pts, cols, EXT, INTR, 8, 8, background=0.0)
    assert float(img[0, 0, 0]) == 0.0
    assert float(alpha[0, 0]) == 0.0

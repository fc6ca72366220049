"""Numerical tests for core primitives against independent numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from more4d_tpu.nn.layers import RMSNorm, layer_norm, sinusoidal_embedding
from more4d_tpu.nn.rope import RopeTables, rope_angles_3d, apply_rope


def test_rmsnorm_matches_numpy():
    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    m = RMSNorm(dim=16, eps=1e-5, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    x = np.random.RandomState(1).randn(3, 7, 32).astype(np.float32)
    out = layer_norm(jnp.asarray(x), eps=1e-6)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(var + 1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_sinusoidal_embedding_layout():
    # cos block first, then sin (wan_transformer4d.py:248)
    dim = 8
    t = np.array([0.0, 3.0, 999.0])
    emb = np.asarray(sinusoidal_embedding(dim, t))
    half = dim // 2
    freqs = 10000.0 ** (-np.arange(half) / half)
    sinusoid = np.outer(t, freqs)
    np.testing.assert_allclose(emb[:, :half], np.cos(sinusoid), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(emb[:, half:], np.sin(sinusoid), rtol=1e-5,
                               atol=1e-6)
    assert emb.shape == (3, dim)


def _rope_reference(x, grid, head_dim, riflex=None):
    """Independent numpy implementation of the reference rope_apply."""
    f, h, w = grid
    d = head_dim
    c = d // 2
    dims = [c - 2 * (c // 3), c // 3, c // 3]

    def axis_freqs(dim_half, k=None, L_test=None, scale=None):
        fr = 1.0 / (10000.0 ** (np.arange(0, 2 * dim_half, 2) / (2 * dim_half)))
        if k is not None:
            fr[k - 1] = 0.9 * 2 * np.pi / L_test
            if scale:
                fr[k - 1] /= scale
        return fr

    ft = axis_freqs(dims[0], *(riflex or ()))
    fh = axis_freqs(dims[1])
    fw = axis_freqs(dims[2])
    ang = np.zeros((f, h, w, c))
    ang[..., :dims[0]] = np.arange(f)[:, None, None, None] * ft
    ang[..., dims[0]:dims[0] + dims[1]] = (np.arange(h)[None, :, None, None]
                                           * fh)
    ang[..., dims[0] + dims[1]:] = np.arange(w)[None, None, :, None] * fw
    ang = ang.reshape(f * h * w, c)
    rot = np.exp(1j * ang)

    b, l, n, _ = x.shape
    seq = f * h * w
    xc = x[:, :seq].reshape(b, seq, n, c, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    xc = xc * rot[None, :, None, :]
    out = np.stack([xc.real, xc.imag], axis=-1).reshape(b, seq, n, d)
    return np.concatenate([out, x[:, seq:]], axis=1)


@pytest.mark.parametrize("head_dim", [12, 24, 128])
def test_rope_matches_complex_reference(head_dim):
    grid = (3, 2, 4)
    seq_pad = 3 * 2 * 4 + 5
    rng = np.random.RandomState(2)
    x = rng.randn(2, seq_pad, 2, head_dim).astype(np.float32)

    tables = RopeTables.create(head_dim)
    cos, sin = rope_angles_3d(tables, grid, seq_len=seq_pad)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    ref = _rope_reference(x, grid, head_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # padded tokens stay untouched
    np.testing.assert_array_equal(out[:, 3 * 2 * 4:], x[:, 3 * 2 * 4:])


def test_rope_riflex_modifies_only_temporal_intrinsic_freq():
    head_dim = 24
    k, l_test, scale = 2, 66, 4.886
    plain = RopeTables.create(head_dim)
    riflex = RopeTables.create(head_dim, riflex_k=k, riflex_l_test=l_test,
                               riflex_scale=scale)
    # only column k-1 of the temporal table changes
    diff = np.abs(plain.t - riflex.t) > 1e-12
    assert diff[:, k - 1].any()
    diff[:, k - 1] = False
    assert not diff.any()
    np.testing.assert_array_equal(plain.h, riflex.h)
    x = np.random.RandomState(3).randn(1, 8, 1, head_dim).astype(np.float32)
    ref = _rope_reference(x, (2, 2, 2), head_dim, riflex=(k, l_test, scale))
    cos, sin = rope_angles_3d(riflex, (2, 2, 2), seq_len=8)
    out = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

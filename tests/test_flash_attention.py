"""Flash-attention kernel vs. dense softmax reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from more4d_tpu.kernels.flash_attention import flash_attention, xla_attention


def _dense_reference(q, k, v, kv_lens=None):
    scale = q.shape[-1] ** -0.5
    s = np.einsum("blhd,bmhd->bhlm", q, k).astype(np.float64) * scale
    if kv_lens is not None:
        mask = np.arange(k.shape[1])[None, :] < np.asarray(kv_lens)[:, None]
        s = np.where(mask[:, None, None, :], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhlm,bmhd->blhd", p, v).astype(np.float32)


@pytest.mark.parametrize("lq,lk", [(64, 64), (40, 24), (128, 512), (17, 9)])
def test_flash_matches_dense(lq, lk):
    rng = np.random.RandomState(0)
    q = rng.randn(2, lq, 2, 64).astype(np.float32)
    k = rng.randn(2, lk, 2, 64).astype(np.float32)
    v = rng.randn(2, lk, 2, 64).astype(np.float32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), block_q=32, block_k=32))
    ref = _dense_reference(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_flash_kv_length_mask():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 32, 2, 64).astype(np.float32)
    k = rng.randn(2, 48, 2, 64).astype(np.float32)
    v = rng.randn(2, 48, 2, 64).astype(np.float32)
    kv_lens = np.array([20, 48], np.int32)
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v),
                                     kv_lens=jnp.asarray(kv_lens),
                                     block_q=16, block_k=16))
    ref = _dense_reference(q, k, v, kv_lens)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    # result must not depend on masked keys
    k2, v2 = k.copy(), v.copy()
    k2[0, 20:] = 123.0
    v2[0, 20:] = -55.0
    out2 = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k2),
                                      jnp.asarray(v2),
                                      kv_lens=jnp.asarray(kv_lens),
                                      block_q=16, block_k=16))
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-5)


def test_flash_bf16_close_to_fp32():
    rng = np.random.RandomState(2)
    q = rng.randn(1, 64, 2, 64).astype(np.float32)
    k = rng.randn(1, 64, 2, 64).astype(np.float32)
    v = rng.randn(1, 64, 2, 64).astype(np.float32)
    out = np.asarray(flash_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), block_q=32, block_k=32)
        .astype(jnp.float32))
    ref = _dense_reference(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.05)


@pytest.mark.parametrize("backward", ["pallas", "xla"])
def test_flash_gradients_match_xla(backward):
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 24, 2, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 24, 2, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 24, 2, 32).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=8, block_k=8,
                                       backward=backward) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("lq,lk", [(40, 24), (17, 9),
    pytest.param(128, 512, marks=pytest.mark.slow)])
def test_pallas_backward_ragged_lengths(lq, lk):
    """Pallas dq/dk/dv vs XLA autodiff at non-block-multiple lengths
    (q/kv padding must not leak into gradients)."""
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(2, lq, 2, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, lk, 2, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, lk, 2, 32).astype(np.float32))
    g = jnp.asarray(rng.randn(2, lq, 2, 32).astype(np.float32))

    def run(backward):
        def f(q, k, v):
            return jnp.vdot(flash_attention(q, k, v, block_q=16, block_k=16,
                                            backward=backward), g)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(run("pallas"), run("xla")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_pallas_backward_kv_lens():
    """Gradients must be exactly zero for masked-out keys/values and must
    not depend on their contents."""
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(2, 32, 2, 32).astype(np.float32))
    k = rng.randn(2, 48, 2, 32).astype(np.float32)
    v = rng.randn(2, 48, 2, 32).astype(np.float32)
    kv_lens = jnp.asarray(np.array([20, 48], np.int32))

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lens=kv_lens, block_q=16,
                                       block_k=16, backward="pallas") ** 2)

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, jnp.asarray(k),
                                                jnp.asarray(v))
    assert float(jnp.abs(dk[0, 20:]).max()) == 0.0
    assert float(jnp.abs(dv[0, 20:]).max()) == 0.0

    k2, v2 = k.copy(), v.copy()
    k2[0, 20:] = 77.0
    v2[0, 20:] = -11.0
    dq2, dk2, dv2 = jax.grad(f, argnums=(0, 1, 2))(q, jnp.asarray(k2),
                                                   jnp.asarray(v2))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dk[0, :20]),
                               np.asarray(dk2[0, :20]), atol=1e-6)


def test_pallas_backward_block_k_bwd_override():
    """block_k_bwd sets the BACKWARD kv tile independently of the
    forward's (bench.py fa_tune sweeps it); gradients must match the XLA
    oracle at a non-default bwd tile, including under kv_lens masking."""
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(2, 40, 2, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 48, 2, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 48, 2, 32).astype(np.float32))
    kv_lens = jnp.asarray(np.array([33, 48], np.int32))

    def run(backward, bkb=None):
        def f(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, kv_lens=kv_lens, block_q=16, block_k=16,
                block_k_bwd=bkb, backward=backward) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(run("pallas", bkb=8), run("xla")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)

"""FP8 weight storage: roundtrip accuracy and model-output closeness."""

import jax
import jax.numpy as jnp
import numpy as np

from more4d_tpu.config import dit_tiny
from more4d_tpu.models import WanDiT
from more4d_tpu.utils import dequantize_params, quantize_params_fp8


def test_fp8_roundtrip_error_small():
    rng = np.random.RandomState(0)
    params = {"layer": {"kernel": jnp.asarray(rng.randn(64, 64) * 0.02,
                                              jnp.float32)}}
    q = quantize_params_fp8(params)
    assert q["layer"]["kernel"]["fp8"].dtype == jnp.float8_e4m3fn
    d = dequantize_params(q, jnp.float32)
    rel = np.abs(np.asarray(d["layer"]["kernel"]) -
                 np.asarray(params["layer"]["kernel"])).max() / 0.02
    assert rel < 0.15  # e4m3 has ~2 decimal digits


def test_fp8_model_output_close():
    cfg = dit_tiny(dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 8, 8, 16), jnp.float32)
    y = jnp.asarray(rng.randn(1, 3, 8, 8, cfg.in_dim - 16), jnp.float32)
    t = jnp.asarray([300.0])
    ctx = jnp.asarray(rng.randn(1, 7, cfg.text_dim), jnp.float32)
    clip = jnp.asarray(rng.randn(1, cfg.clip_tokens, cfg.clip_dim),
                       jnp.float32)
    model = WanDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, y=y, clip_fea=clip)
    leaves, td = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        td, [jnp.asarray(np.random.RandomState(2).normal(0, 0.04, l.shape),
                         l.dtype) for l in leaves])

    ref = model.apply(params, x, t, ctx, y=y, clip_fea=clip)
    deq = dequantize_params(quantize_params_fp8(params), jnp.float32)
    out = model.apply(deq, x, t, ctx, y=y, clip_fea=clip)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max() + 1e-6
    assert err.max() / scale < 0.15
    # norms/modulation stayed fp32
    assert deq["params"]["blocks"]["block"]["norm3"]["weight"].dtype \
        == jnp.float32

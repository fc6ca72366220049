"""Long-video capability probe: 1.3B CFG denoise at 81 frames, 368x512
(L = 21*23*32 = 15,456 tokens) with RIFLEx temporal extrapolation — the
reference's >49f mode (enable_riflex, wan_transformer4d.py:1011-1026).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/more4d_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from more4d_tpu.config import dit_1_3b
from more4d_tpu.models import WanDiT
from more4d_tpu.nn.rope import RopeTables
from more4d_tpu.utils.flops import detect_tpu_peak, dit_forward_flops

frames, h, w = 81, 368, 512
lt, lh, lw = (frames - 1) // 4 + 1, h // 8, w // 8
cfg = dit_1_3b(motion_guidance=True, in_dim=64, model_type="i2v",
               dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
model = WanDiT(cfg)
mk = lambda *s: jnp.zeros(s, jnp.bfloat16)  # noqa: E731
x = jax.random.normal(jax.random.PRNGKey(0), (1, lt, lh, lw, 16),
                      jnp.float32).astype(jnp.bfloat16)
t = jnp.full((1,), 500.0, jnp.float32)
ctx = mk(1, cfg.text_len, cfg.text_dim)
y = mk(1, lt, lh, lw, 48)
clip = mk(1, cfg.clip_tokens, cfg.clip_dim)
mpm = mk(1, 196, cfg.motion_feature_dim)
params = jax.jit(model.init)(jax.random.PRNGKey(1), x, t, ctx, y=y,
                             clip_fea=clip, mpm_features=mpm)
# RIFLEx: intrinsic index k=4 lowered to the test length (reference
# default for Wan at 1.5x+ temporal extrapolation)
tables = RopeTables.create(cfg.head_dim, riflex_k=4, riflex_l_test=lt)

x2 = jnp.concatenate([x, x], 0)
t2 = jnp.concatenate([t, t], 0)
ctx2 = jnp.concatenate([ctx, ctx], 0)
y2 = jnp.concatenate([y, y], 0)
clip2 = jnp.concatenate([clip, clip], 0)
mpm2 = jnp.concatenate([mpm, mpm], 0)


def chain(params, xc, n):
    def body(i, acc):
        xin = jnp.concatenate([acc, acc], 0)
        out = model.apply(params, xin, t2, ctx2, y=y2, clip_fea=clip2,
                          mpm_features=mpm2, rope_tables=tables)
        b = acc.shape[0]
        pred = out[:b] + 6.0 * (out[:b] - out[b:])
        return acc - 0.02 * pred.astype(acc.dtype)

    return jax.lax.fori_loop(0, n, body, xc)


jit_chain = jax.jit(chain, static_argnums=())


def run(n):
    t0 = time.perf_counter()
    out = jit_chain(params, x, jnp.asarray(n, jnp.int32))
    float(jnp.sum(out.astype(jnp.float32)))
    return time.perf_counter() - t0


run(1)
t_lo = min(run(1) for _ in range(2))
t_hi = min(run(6) for _ in range(2))
sps = 5 / max(t_hi - t_lo, 1e-9)
tokens = lt * (lh // 2) * (lw // 2)
flops = dit_forward_flops(cfg, tokens, batch=2)
peak = detect_tpu_peak()
print(json.dumps({
    "frames": frames, "tokens_L": tokens,
    "steps_per_sec": round(sps, 4),
    "tflops_per_s": round(flops * sps / 1e12, 1),
    "mfu": round(flops * sps / peak, 4),
}))

"""Flash-attention block-size sweep at the Wan operating point.

B=2 (CFG pair), H=12, L=9568, D=128 bf16 — the 1.3B denoise attention
shape. Times fwd-only and fwd+bwd for block_q x block_k combinations.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/more4d_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from more4d_tpu.kernels.flash_attention import flash_attention

B, H, L, D = 2, 12, 9568, 128
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)

# attention flops: 2 matmuls of [L,D]x[D,L] and [L,L]x[L,D] per head
FLOPS = 2 * 2 * B * H * L * L * D

res = {}


def bench(fn, tag, iters=10):
    f = jax.jit(fn)
    out = f(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))  # compile+warm fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    res[tag] = round(FLOPS / dt / 1e12, 1)


for bq in (256, 512, 1024):
    for bk in (2432, 4864):
        try:
            bench(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, block_q=bq, block_k=bk), f"fwd_q{bq}_k{bk}")
        except Exception as e:
            res[f"fwd_q{bq}_k{bk}"] = f"{type(e).__name__}: {str(e)[:80]}"
        print(json.dumps(res), flush=True)


def vag(bq):
    def loss(qq):
        return jnp.sum(flash_attention(qq, k, v, block_q=bq)
                       .astype(jnp.float32))

    return jax.grad(loss)


for bq in (256, 512):
    try:
        g = jax.jit(vag(bq))
        float(jnp.sum(g(q).astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(5):
            out = g(q)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 5
        # fwd (recomputed in bwd) + dq + dkv ~ 4x fwd matmul work + fwd
        res[f"fwdbwd_q{bq}_tf_at_5x"] = round(5 * FLOPS / 2 / dt / 1e12, 1)
    except Exception as e:
        res[f"fwdbwd_q{bq}"] = f"{type(e).__name__}: {str(e)[:80]}"
    print(json.dumps(res), flush=True)

print("FINAL " + json.dumps(res))

"""Probe: flash attention fwd / fwd+bwd TF/s at the Wan operating point
(B=2 CFG, H=12, L=9568, D=128, bf16) across tile configs.  Round-4 scratch."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", "/root/.cache/more4d_jax")

from more4d_tpu.kernels.flash_attention import flash_attention

B, H, L, D = 2, 12, 9568, 128
rng = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(rng, 3)
q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)
lens = jnp.full((B,), L, jnp.int32)

fwd_flops = 4.0 * L * L * D * B * H
N = 20

for bq in (256, 512, 768, 1024):
    for bk in (None, 2432, 1216):
        try:
            f = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, kv_lens=lens, block_q=bq, block_k=bk))
            out = f(q, k, v); jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(N):
                out = f(q, k, v)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / N
            print(f"fwd bq={bq} bk={bk}: {dt*1e3:.2f} ms "
                  f"{fwd_flops/dt/1e12:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"fwd bq={bq} bk={bk}: {type(e).__name__} "
                  f"{str(e)[:80]}", flush=True)

# fwd+bwd (grad wrt q,k,v), total executed flops = fwd + 2.5x fwd
def loss(q, k, v):
    return jnp.sum(flash_attention(q, k, v, kv_lens=lens,
                                   block_q=512).astype(jnp.float32))

g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
outs = g(q, k, v); jax.block_until_ready(outs)
t0 = time.perf_counter()
for _ in range(6):
    outs = g(q, k, v)
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 6
print(f"fwd+bwd: {dt*1e3:.2f} ms {3.5*fwd_flops/dt/1e12:.1f} TF/s "
      f"(3.5x-fwd accounting)", flush=True)
print("OK", flush=True)

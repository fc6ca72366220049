"""Benchmark: DiT denoise steps/sec/chip at the reference operating point.

Runs on real TPU hardware (driver-invoked). One denoise step = one
CFG-doubled forward of the 4D-STraG DiT at 49 frames, 368x512 (9,568 tokens,
the reference's default; BASELINE.md). Prints ONE JSON line.

Notes on methodology: this environment's PJRT relay makes dispatch fully
async (block_until_ready does not wait) and adds ~tens of ms per call, so we
chain N denoise steps inside ONE jitted lax.fori_loop and force a scalar
readback; steps/sec = (N_hi - N_lo) / (t_hi - t_lo) cancels the constant
round-trip overhead.

The reference publishes no benchmark numbers (BASELINE.json published={}), so
``vs_baseline`` is reported against our own recorded baseline in
bench_baseline.json when present, else 1.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_chain(fn, params, x, t, ctx, y, clip, mpm, guidance=6.0):
    """Build a jitted n-step CFG denoise chain (data-dependent across steps)."""

    ctx2 = jnp.concatenate([ctx, ctx], 0)
    y2 = jnp.concatenate([y, y], 0)
    clip2 = jnp.concatenate([clip, clip], 0)
    mpm2 = jnp.concatenate([mpm, mpm], 0)
    t2 = jnp.concatenate([t, t], 0)

    def chain(params, x, ctx2, y2, clip2, mpm2, t2, n):
        def body(i, xc):
            x2 = jnp.concatenate([xc, xc], 0)
            out = fn(params, x2, t2, ctx2, y2, clip2, mpm2)
            b = xc.shape[0]
            pred = out[:b] + guidance * (out[:b] - out[b:])
            return xc - 0.02 * pred.astype(xc.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    jitted = jax.jit(chain, static_argnums=(7,))
    return lambda params, x, n: jitted(params, x, ctx2, y2, clip2, mpm2,
                                       t2, n)


def main():
    cache_dir = os.environ.get("MORE4D_COMPILE_CACHE",
                               "/root/.cache/more4d_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    size = os.environ.get("MORE4D_BENCH_SIZE", "1.3b")
    os.environ["MORE4D_ENTRY_SIZE"] = size
    import __graft_entry__ as ge

    fn, args = ge.entry()
    params, x, t, ctx, y, clip, mpm = args

    chain = _timed_chain(fn, params, x, t, ctx, y, clip, mpm)

    def run(n):
        t0 = time.perf_counter()
        out = chain(params, x, n)
        _ = float(jnp.sum(out.astype(jnp.float32)))  # force readback
        return time.perf_counter() - t0

    n_lo = 1
    n_hi = int(os.environ.get("MORE4D_BENCH_ITERS", "8"))
    run(n_lo)            # warmup/compile for n_lo graph
    run(n_hi)            # warmup/compile for n_hi graph
    t_lo = min(run(n_lo) for _ in range(2))
    t_hi = min(run(n_hi) for _ in range(2))
    steps_per_sec = (n_hi - n_lo) / max(t_hi - t_lo, 1e-9)

    vs = 1.0
    base_path = os.path.join(os.path.dirname(__file__),
                             "bench_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = steps_per_sec / base["value"]

    print(json.dumps({
        "metric": f"dit_denoise_steps_per_sec_per_chip[{size},49f,368x512,cfg2x]",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()

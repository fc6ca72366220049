"""Phase breakdown of the 1.3B stage-1 Control pipeline call.

bench_two_stage measures ctrl(...) monolithically at 15.1 s; its parts
should be ~4 s denoise-calc + ~2.4 s decode. Where are the other ~7 s?
Phases: prepare_conditions (control+depth VAE encodes, static shortcut),
denoise loop, decode.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/more4d_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from more4d_tpu.config import PipelineConfig, VAEConfig, dit_1_3b
from more4d_tpu.models import WanDiT
from more4d_tpu.models.wan_vae import WanVAE
from more4d_tpu.pipelines import (TEACACHE_COEFFICIENTS, TeaCacheConfig,
                                  WanControlPipeline)

h, w, t_frames, steps = 368, 512, 49, 50
cfg4 = dit_1_3b(motion_guidance=True, in_dim=64, model_type="i2v",
                dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
dit4 = WanDiT(cfg4)
vae = WanVAE(VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16))
tc = TeaCacheConfig(
    coefficients=tuple(TEACACHE_COEFFICIENTS["wan2.1-fun-1.3b"]),
    rel_l1_thresh=0.10, num_skip_start_steps=5)
pcfg = PipelineConfig(num_inference_steps=steps, num_frames=t_frames,
                      height=h, width=w, cfg_skip_ratio=0.15)
ctrl = WanControlPipeline(dit4, vae, pcfg, teacache=tc)

rng = jax.random.PRNGKey(0)
lt, lh, lw = (t_frames - 1) // 4 + 1, h // 8, w // 8
mk = lambda *s: jnp.zeros(s, jnp.bfloat16)  # noqa: E731
p4 = jax.jit(dit4.init)(rng, mk(1, lt, lh, lw, 16),
                        jnp.zeros((1,), jnp.float32),
                        mk(1, cfg4.text_len, cfg4.text_dim),
                        y=mk(1, lt, lh, lw, 48),
                        clip_fea=mk(1, cfg4.clip_tokens, cfg4.clip_dim),
                        mpm_features=mk(1, 196, cfg4.motion_feature_dim))
vp = jax.jit(vae.init)(rng, mk(1, 5, 64, 64, 3))

rs = np.random.RandomState(0)
image = jnp.asarray(rs.rand(h, w, 3) * 2 - 1, jnp.float32)
control = jnp.broadcast_to(image[None, None], (1, t_frames, h, w, 3))
prompt = mk(1, cfg4.text_len, cfg4.text_dim).astype(jnp.float32)
clip_fea = mk(1, cfg4.clip_tokens, cfg4.clip_dim)
mpm = mk(1, 196, cfg4.motion_feature_dim)
fence = lambda a: float(jnp.sum(jnp.abs(a).astype(jnp.float32)))  # noqa

res = {}


def tmed(f, n=2):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)), 2)


latents = ctrl.prepare_latents(rng, 1)
res["prepare_conditions_s"] = tmed(lambda: fence(ctrl.prepare_conditions(
    vp, latents.shape, control, depth_image=image[None, None])))
y = ctrl.prepare_conditions(vp, latents.shape, control,
                            depth_image=image[None, None])

res["denoise_s"] = tmed(lambda: fence(ctrl.denoise(
    p4, latents, prompt, neg_embeds=prompt, y=y, clip_fea=clip_fea,
    mpm_features=mpm)))
lat = ctrl.denoise(p4, latents, prompt, neg_embeds=prompt, y=y,
                   clip_fea=clip_fea, mpm_features=mpm)
res["decode_s"] = tmed(lambda: fence(ctrl.decode_latents(vp, lat)))

t0 = time.perf_counter()
out = ctrl(p4, vp, rng, prompt, neg_embeds=prompt, control_video=control,
           depth_image=image[None, None], clip_fea=clip_fea,
           mpm_features=mpm, output_type="no_normalize")
fence(out)
res["full_call_s"] = round(time.perf_counter() - t0, 2)
print(json.dumps(res))

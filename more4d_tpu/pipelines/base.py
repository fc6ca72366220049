"""Shared denoise-loop machinery for the Wan pipelines.

One fully-jitted ``lax.fori_loop`` per CFG phase; TeaCache and cfg-skip as
described in control.py. Both stage pipelines subclass :class:`BasePipeline`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..diffusion import get_scheduler
from ..models.wan_dit import WanDiT
from ..models.wan_vae import WanVAE
from ..nn.rope import RopeTables

# TeaCache rescale polynomials per backbone (models/cache_utils.py:4-16).
TEACACHE_COEFFICIENTS = {
    "wan2.1-fun-1.3b": [-5.21862437e+04, 9.23041404e+03, -5.28275948e+02,
                        1.36987616e+01, -4.99875664e-02],
    "wan2.1-t2v-14b": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03,
                       5.87365115e+01, -3.15583525e-01],
    "wan2.1-fun-14b": [8.10705460e+03, 2.13393892e+03, -3.72934672e+02,
                       1.66203073e+01, -4.17769401e-02],
}


@dataclasses.dataclass(frozen=True)
class TeaCacheConfig:
    coefficients: Tuple[float, ...]
    rel_l1_thresh: float = 0.1
    num_skip_start_steps: int = 5
    # Park the cached residual in pinned host memory between steps (the
    # reference's TeaCache offload=True, models/cache_utils.py:44-74):
    # frees the [2B, L, D] buffer from HBM for the price of one
    # host->device read per step (and one write on calc steps).  The
    # denoise loop stays numerically identical
    # (test_pipelines.py::test_teacache_residual_offload_identical).
    # Single-device memory mode — not for mesh-sharded latents.
    offload_residual: bool = False


class BasePipeline:
    def __init__(self, dit: WanDiT, vae: WanVAE,
                 config: PipelineConfig = PipelineConfig(),
                 teacache: Optional[TeaCacheConfig] = None,
                 streamed_dit=None):
        self.dit = dit
        self.vae = vae
        self.config = config
        self.teacache = teacache
        # Host-offloaded execution (parallel/offload.StreamedDiT): when
        # set, the denoise loop streams block weights from pinned host
        # memory — the 14B-on-one-chip memory mode (infer.py:685-707).
        self.streamed_dit = streamed_dit
        self.scheduler = get_scheduler(config.scheduler,
                                       config.num_inference_steps,
                                       config.shift,
                                       **dict(config.scheduler_kwargs))
        riflex = {}
        if config.riflex_k:
            lt = (config.num_frames - 1) // 4 + 1
            riflex = dict(riflex_k=config.riflex_k, riflex_l_test=lt)
        self.rope_tables = RopeTables.create(dit.cfg.head_dim, **riflex)

    # ---------------- VAE helpers ---------------- #

    def encode_video(self, vae_params, video, static_hint: bool = False):
        """video [B,T,H,W,3] in [-1,1] -> deterministic (mode) latents.

        Uses the chunked streaming driver (frame chunks [1,4,4,...] as a
        lax.scan over the conv caches, the reference's wan_vae.py:520-547
        semantics): the fused full-sequence encoder materialises ~2 GB
        activations per layer at 49f 368x512 and OOMs a 16 GB chip.
        ``static_hint`` turns on the exact fixed-point shortcut for
        repeated-frame videos (see encode_streamed)."""
        from ..models.vae_streaming import encode_streamed

        mu, _ = encode_streamed(
            self.vae, vae_params, video, static_hint=static_hint,
            latents_per_step=self.config.vae_latents_per_step)
        return mu

    def decode_latents(self, vae_params, latents, normalize_output=True):
        """Latents -> frames. True maps to [0,1] (decode_latents,
        pipeline_wan_fun_control.py:376-381); False returns the raw [-1,1]
        decode used for trajectory tensors (decode_latents_no_normalize).
        Streamed per latent frame (wan_vae.py:678-703)."""
        from ..models.vae_streaming import decode_streamed

        frames = decode_streamed(
            self.vae, vae_params, latents,
            latents_per_step=self.config.vae_latents_per_step)
        if normalize_output:
            frames = jnp.clip(frames / 2 + 0.5, 0.0, 1.0)
        return frames

    def prepare_latents(self, rng, batch, num_frames=None, height=None,
                        width=None):
        cfgp = self.config
        num_frames = num_frames or cfgp.num_frames
        height = height or cfgp.height
        width = width or cfgp.width
        tl = (num_frames - 1) // self.vae.cfg.temporal_ratio + 1
        h = height // self.vae.cfg.spatial_ratio
        w = width // self.vae.cfg.spatial_ratio
        return jax.random.normal(rng, (batch, tl, h, w, self.vae.cfg.z_dim),
                                 jnp.float32)

    # ---------------- denoise loop ---------------- #

    def _build_step(self, cfg_double: bool, dit=None):
        dit, sched = dit or self.dit, self.scheduler
        timesteps = jnp.asarray(sched.timesteps, jnp.float32)
        tc = self.teacache
        s_host = s_dev = None
        if tc is not None and tc.offload_residual:
            from ..parallel.offload import _shardings

            s_host, s_dev = _shardings()

        def dit_forward(params, x, t, ctx, y, clip, mpm, tc_state):
            it = dit.apply(params, x, t, ctx, y=y, clip_fea=clip,
                           mpm_features=mpm, rope_tables=self.rope_tables,
                           method=WanDiT.embed)
            tokens_in = it.tokens

            if tc is None:
                tokens = dit.apply(params, it, method=WanDiT.backbone)
                return dit.apply(params, tokens, it,
                                 method=WanDiT.finalize), tc_state

            # TeaCache decision on the modulated timestep embedding e0
            # (wan_transformer4d.py:1200-1270)
            e0 = it.e0.astype(jnp.float32)
            prev = tc_state["prev_e0"]
            rel = jnp.abs(e0 - prev).mean() / jnp.maximum(
                jnp.abs(prev).mean(), 1e-8)
            poly = jnp.polyval(jnp.asarray(tc.coefficients, jnp.float32),
                               rel)
            warm = tc_state["steps_seen"] < tc.num_skip_start_steps
            accum = jnp.where(warm, 0.0, tc_state["accum"] + poly)
            should_calc = jnp.logical_or(warm, accum >= tc.rel_l1_thresh)
            accum = jnp.where(should_calc, 0.0, accum)

            # residual kept in the model dtype — the reference stores it in
            # x's dtype too (wan_transformer4d.py:1267-1270); fp32 would
            # cost 2x HBM on the batched trajectory sweep
            res_in = tc_state["residual"]
            if s_dev is not None:
                # offloaded residual: read back from pinned host before the
                # cond (both branches must see device placement); written
                # back to host below
                res_in = jax.device_put(res_in, s_dev)

            def run(_):
                tokens = dit.apply(params, it, method=WanDiT.backbone)
                return tokens, (tokens - tokens_in)

            def replay(_):
                return (tokens_in + res_in.astype(tokens_in.dtype), res_in)

            tokens, residual = jax.lax.cond(should_calc, run, replay, None)
            if s_host is not None:
                residual = jax.device_put(residual, s_host)
            new_state = {
                "prev_e0": e0,
                "accum": accum,
                "residual": residual,
                "steps_seen": tc_state["steps_seen"] + 1,
            }
            out = dit.apply(params, tokens, it, method=WanDiT.finalize)
            return out, new_state

        def step(i, carry, params, ctx, y, clip, mpm, guidance):
            latents, sched_state, tc_state = carry
            if cfg_double:
                x_in = jnp.concatenate([latents, latents], axis=0)
            else:
                x_in = latents
            t = jnp.broadcast_to(timesteps[i], (x_in.shape[0],))
            pred, tc_state = dit_forward(params, x_in, t, ctx, y, clip, mpm,
                                         tc_state)
            if cfg_double:
                b = latents.shape[0]
                uncond, cond = pred[:b], pred[b:]
                pred = uncond + guidance * (cond - uncond)
            latents, sched_state = sched.step(i, latents,
                                              pred.astype(jnp.float32),
                                              sched_state)
            return latents, sched_state, tc_state

        return step

    def _teacache_state(self, batch, latents, dit=None):
        dit = dit or self.dit
        if self.teacache is None:
            return ()
        f = latents.shape[1] // dit.cfg.patch_size[0]
        hh = latents.shape[2] // dit.cfg.patch_size[1]
        ww = latents.shape[3] // dit.cfg.patch_size[2]
        d = dit.cfg.dim
        residual = jnp.zeros((batch, f * hh * ww, d), dit.cfg.dtype)
        if self.teacache.offload_residual:
            from ..parallel.offload import _shardings

            residual = jax.device_put(residual, _shardings()[0])
        return {
            "prev_e0": jnp.zeros((batch, 6, d), jnp.float32),
            "accum": jnp.zeros((), jnp.float32),
            "residual": residual,
            "steps_seen": jnp.zeros((), jnp.int32),
        }

    def denoise(self, dit_params, latents, prompt_embeds, neg_embeds=None,
                y=None, clip_fea=None, mpm_features=None,
                guidance_scale=None):
        """Full denoise loop. latents: [B, T', h, w, 16] initial noise;
        prompt/neg embeds: [B, L, text_dim]. Returns final latents."""
        cfgp = self.config
        if guidance_scale is None:
            guidance_scale = cfgp.guidance_scale
        dit = self.dit
        if self.streamed_dit is not None:
            # Python-level fenced step loop (StreamedDiT.denoise): measured
            # fastest on this relay (5.4 s/step at 14B) vs one whole-loop
            # graph (23.8 s/step: the XLA while loop defeats copy/compute
            # pipelining) or unfenced dispatch (7-11 s/step). TeaCache and
            # cfg-skip semantics preserved (host-side, decision-precomputed).
            from ..parallel.offload import _HostTeaCache

            tc = None
            if self.teacache is not None:
                tc = _HostTeaCache(self.teacache.coefficients,
                                   self.teacache.rel_l1_thresh,
                                   self.teacache.num_skip_start_steps)
            return self.streamed_dit.denoise(
                self.scheduler, latents, prompt_embeds,
                neg_embeds=neg_embeds, y=y, clip_fea=clip_fea,
                mpm_features=mpm_features, guidance_scale=guidance_scale,
                cfg_skip_ratio=cfgp.cfg_skip_ratio, teacache=tc)
        do_cfg = guidance_scale > 1.0 and neg_embeds is not None
        n = self.scheduler.num_steps
        n_skip = int(math.ceil(n * cfgp.cfg_skip_ratio)) if do_cfg else 0
        n_cfg = (n - n_skip) if do_cfg else 0

        b = latents.shape[0]

        def dup(a):
            return None if a is None else jnp.concatenate([a, a], axis=0)

        sched_state = self.scheduler.init_state(latents.shape)

        tc_carry = None
        if do_cfg and n_cfg > 0:
            ctx2 = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            y2, clip2, mpm2 = dup(y), dup(clip_fea), dup(mpm_features)
            step = self._build_step(cfg_double=True, dit=dit)

            def body_a(i, carry):
                return step(i, carry, dit_params, ctx2, y2, clip2, mpm2,
                            guidance_scale)

            latents, sched_state, tc_carry = jax.lax.fori_loop(
                0, n_cfg, body_a,
                (latents, sched_state,
                 self._teacache_state(2 * b, latents, dit)))

        if (not do_cfg) or n_skip > 0:
            step = self._build_step(cfg_double=False, dit=dit)

            def body_b(i, carry):
                return step(i, carry, dit_params, prompt_embeds, y, clip_fea,
                            mpm_features, guidance_scale)

            tc_state = self._teacache_state(b, latents, dit)
            if self.teacache is not None and tc_carry:
                # continue across the cfg-skip transition like the
                # reference (cache_utils [-bs:]: the cond halves of the
                # doubled-phase state; e0 halves are identical) instead
                # of re-warming
                residual = tc_carry["residual"][-b:]
                if self.teacache.offload_residual:
                    # the slice lands in device memory — park it back on
                    # the host so the second loop's carry placement
                    # matches its init
                    from ..parallel.offload import _shardings

                    residual = jax.device_put(residual, _shardings()[0])
                tc_state = {
                    "prev_e0": tc_carry["prev_e0"][-b:],
                    "accum": tc_carry["accum"],
                    "residual": residual,
                    "steps_seen": tc_carry["steps_seen"],
                }
            start = n_cfg if do_cfg else 0
            latents, sched_state, _ = jax.lax.fori_loop(
                start, n, body_b,
                (latents, sched_state, tc_state))

        return latents

"""Stage-1 control pipeline (4D-STraG trajectory generation), TPU-native.

Re-implements ``WanFunControlPipeline.__call__``
(MoRe4D/pipeline/pipeline_wan_fun_control.py:477-858):

- conditioning ``y`` = [control latents | start-image latents | depth
  latents], 48 channels (:744-777; with the 16ch noise -> the 64ch DiT input
  assembled in train_wan.py:824-859).
- CFG by batch doubling inside the jitted step (:744-756).
- cfg-skip (utils/cfg_optimization.py) and TeaCache (models/cache_utils.py)
  — see base.py.

Heavy encoders (T5/CLIP/OmniMAE/UniDepth) run outside; this class consumes
their embeddings. Everything is functional — params are arguments.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import BasePipeline, TeaCacheConfig, TEACACHE_COEFFICIENTS  # noqa: F401


class WanControlPipeline(BasePipeline):

    def prepare_conditions(self, vae_params, latents_shape,
                           control_video=None, start_image=None,
                           depth_image=None):
        """Build the conditioning ``y`` (pipeline :610-777).

        control_video: [B,T,H,W,3] in [-1,1] (the repeated first frame for
        4D-STraG); start_image: [B,1,H,W,3]; depth_image: [B,1,H,W,3]
        (repeated to T frames before VAE encoding, :644-655).
        Returns [B, T', h, w, 32 or 48].
        """
        b, tl, h, w, _ = latents_shape
        z = self.vae.cfg.z_dim
        parts = []

        ctrl_lat = depth_lat = None
        if control_video is not None and depth_image is not None:
            # ONE batch-2b encode for the two static hints: the encoder is
            # per-sample (convs + per-sample GroupNorm), so stacking is
            # bit-identical to two serial calls and halves the dominant
            # stage-1 prepare cost (measured 6.3 s for the two serial
            # encodes at 49f 368x512 on the v5e)
            t_frames = (tl - 1) * self.vae.cfg.temporal_ratio + 1
            depth_video = jnp.broadcast_to(
                depth_image, (b, t_frames) + depth_image.shape[2:])
            stacked = jnp.concatenate([control_video, depth_video], axis=0)
            lat = self.encode_video(vae_params, stacked, static_hint=True)
            ctrl_lat, depth_lat = lat[:b], lat[b:]

        if control_video is not None:
            # 4D-STraG's control video is the first frame repeated
            # (infer.py:830-846) — the static fixed-point shortcut skips
            # converged encoder chunks and stays exact for real videos
            parts.append(ctrl_lat if ctrl_lat is not None else
                         self.encode_video(vae_params, control_video,
                                           static_hint=True))
        else:
            parts.append(jnp.zeros((b, tl, h, w, z), jnp.float32))

        start = jnp.zeros((b, tl, h, w, z), jnp.float32)
        if start_image is not None:
            start_lat = self.encode_video(vae_params, start_image)
            start = start.at[:, :1].set(start_lat)
        parts.append(start)

        if depth_image is not None:
            if depth_lat is None:
                t_frames = (tl - 1) * self.vae.cfg.temporal_ratio + 1
                depth_video = jnp.broadcast_to(
                    depth_image, (b, t_frames) + depth_image.shape[2:])
                depth_lat = self.encode_video(vae_params, depth_video,
                                              static_hint=True)
            parts.append(depth_lat)

        return jnp.concatenate(parts, axis=-1)

    def __call__(self, dit_params, vae_params, rng, prompt_embeds,
                 neg_embeds=None, control_video=None, start_image=None,
                 depth_image=None, clip_fea=None, mpm_features=None,
                 num_frames=None, height=None, width=None,
                 output_type="latent", guidance_scale=None):
        """Full stage-1 generation. Returns latents or decoded frames
        ([-1,1] raw for trajectory tensors when output_type='no_normalize',
        [0,1] for 'numpy')."""
        b = prompt_embeds.shape[0]
        latents = self.prepare_latents(rng, b, num_frames, height, width)
        y = self.prepare_conditions(vae_params, latents.shape,
                                    control_video, start_image, depth_image)
        latents = self.denoise(dit_params, latents, prompt_embeds,
                               neg_embeds, y=y, clip_fea=clip_fea,
                               mpm_features=mpm_features,
                               guidance_scale=guidance_scale)
        if output_type == "latent":
            return latents
        return self.decode_latents(vae_params, latents,
                                   normalize_output=(output_type != "no_normalize"))

"""Stage-2 inpainting pipeline (4D-ViSM disocclusion fill), TPU-native.

Re-implements ``WanFunInpaintPipeline.__call__``
(MoRe4D/pipeline/pipeline_wan_fun_inpaint.py): the rendered novel-view video
with disocclusion holes is VAE-encoded after masking, and the DiT input is
``y = [mask latents (4ch) | masked-video latents (16ch)]`` (:714) + 16ch
noise = the 36ch InP model.

Mask pipeline (:611-676): mask in [0,1] with 1 = hole; the first frame is
repeated 4x and folded into 4 channels matching the VAE's temporal packing;
``resize_mask`` (:99-135) downsamples (1 - mask) to the latent grid with the
first frame handled separately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import BasePipeline, TeaCacheConfig  # noqa: F401
from ..models.wan_vae import WanVAE


def fold_mask_to_latent_channels(mask):
    """[B,T,H,W,1] (1 = hole) -> [B,T',H,W,4] with the 4x temporal packing
    (pipeline :640-648): first frame repeated 4x, then groups of 4 frames
    become channels."""
    b, t, h, w, _ = mask.shape
    m = jnp.concatenate([jnp.repeat(mask[:, :1], 4, axis=1), mask[:, 1:]],
                        axis=1)  # [B, 4 + (T-1), H, W, 1]
    tl = m.shape[1] // 4
    m = m.reshape(b, tl, 4, h, w)
    return jnp.moveaxis(m, 2, -1)  # [B, T', H, W, 4]


def resize_mask_to_latent(mask4, latent_shape):
    """Trilinear resize of the folded mask to the latent grid, first frame
    processed separately (resize_mask, :99-135). mask4: [B,T',H,W,4]."""
    b, tl, h, w, c = mask4.shape
    _, tl_lat, hl, wl, _ = latent_shape
    first = jax.image.resize(mask4[:, :1], (b, 1, hl, wl, c), "trilinear")
    if tl_lat > 1:
        rest = jax.image.resize(mask4[:, 1:], (b, tl_lat - 1, hl, wl, c),
                                "trilinear")
        return jnp.concatenate([first, rest], axis=1)
    return first


class WanInpaintPipeline(BasePipeline):

    def prepare_conditions(self, vae_params, latents_shape, video=None,
                           mask=None, all_mask=False):
        """video: [B,T,H,W,3] in [-1,1]; mask: [B,T,H,W,1] in [0,1]
        (1 = hole to inpaint). Returns y [B,T',h,w,20].

        ``all_mask`` encodes the raw video instead of zeroing holes
        (pipeline :618-646) — used when the renderer already left holes
        black."""
        b, tl, h, w, _ = latents_shape
        z = self.vae.cfg.z_dim

        if video is None:
            mask_lat = jnp.zeros((b, tl, h, w, 4), jnp.float32)
            masked_lat = jnp.zeros((b, tl, h, w, z), jnp.float32)
            return jnp.concatenate([mask_lat, masked_lat], axis=-1)

        if mask is None:
            mask = jnp.zeros(video.shape[:-1] + (1,), jnp.float32)

        masked_video = video if all_mask else video * (mask < 0.5)
        masked_lat = self.encode_video(vae_params, masked_video)

        mask4 = fold_mask_to_latent_channels(1.0 - mask)
        mask_lat = resize_mask_to_latent(mask4, masked_lat.shape)
        return jnp.concatenate([mask_lat, masked_lat], axis=-1)

    def __call__(self, dit_params, vae_params, rng, prompt_embeds,
                 neg_embeds=None, video=None, mask=None, clip_fea=None,
                 all_mask=False, num_frames=None, height=None, width=None,
                 output_type="numpy", guidance_scale=None):
        b = prompt_embeds.shape[0]
        latents = self.prepare_latents(rng, b, num_frames, height, width)
        y = self.prepare_conditions(vae_params, latents.shape, video, mask,
                                    all_mask)
        latents = self.denoise(dit_params, latents, prompt_embeds,
                               neg_embeds, y=y, clip_fea=clip_fea,
                               guidance_scale=guidance_scale)
        if output_type == "latent":
            return latents
        return self.decode_latents(vae_params, latents)

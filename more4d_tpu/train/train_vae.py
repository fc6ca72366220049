"""VAE trajectory-adaptor trainer.

Re-implements scripts/4D_STraG_training/train_vae.py (train_step :434-495,
compute_loss :173-187): the encoder adaptor maps normalized xyz scene-flow
into pseudo-RGB ([0,1] -> *2-1), the frozen causal VAE encodes, samples the
posterior, decodes (decoder trainable when finetune_vae_decoder), and the
decoder adaptor maps decoded RGB back to flow.

Loss = sum(L1)/B + kl_scale * sum(KL)/B with
KL = 0.5 * sum(mu^2 + var - 1 - logvar) per sample (diffusers
DiagonalGaussianDistribution.kl), kl_scale = 1e-6.

Reference quirk, resolved deliberately (SURVEY.md §2.4 spirit): the
reference wraps ``vae.encode`` in torch.no_grad (:443), which cuts the only
gradient path to the *encoder* adaptor — as released it never trains.
``encoder_grad_through_vae=True`` (default) restores the intended gradient;
set False for reference-literal behaviour.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ..models.adaptors import VAEDecoderAdaptor, VAEEncoderAdaptor
from ..models.wan_vae import WanVAE


@dataclasses.dataclass(frozen=True)
class VAEAdaptorTrainConfig:
    learning_rate: float = 5e-6
    kl_scale: float = 1e-6
    finetune_decoder: bool = True
    rec_loss: str = "l1"                   # 'l1' | 'l2'
    max_grad_norm: float = 1.0
    encoder_grad_through_vae: bool = True


def make_vae_adaptor_train_step(enc_adaptor: VAEEncoderAdaptor,
                                dec_adaptor: VAEDecoderAdaptor,
                                vae: WanVAE,
                                tx: optax.GradientTransformation,
                                cfg: VAEAdaptorTrainConfig):
    """Returns step(trainable, opt_state, vae_params, batch, rng) -> (...).

    trainable = {'enc': ..., 'dec': ..., optional 'vae_decoder':
    {'decoder': ..., 'conv2': ...}}. batch: {'flow': [B,T,H,W,3] normalized
    trajectory tensors (depth-guided or first-frame-relative; the
    normalization itself lives in more4d_tpu.geometry.normalize)}.
    """

    def step(trainable, opt_state, vae_params, batch, rng):
        flow = batch["flow"].astype(jnp.float32)
        b = flow.shape[0]

        def loss_fn(tr):
            vp_frozen = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                               vae_params)
            vp_dec = vp_frozen
            if cfg.finetune_decoder and "vae_decoder" in tr:
                vp_dec = {"params": {
                    **vp_frozen["params"],
                    "decoder": tr["vae_decoder"]["decoder"],
                    "conv2": tr["vae_decoder"]["conv2"]}}

            pseudo_rgb = enc_adaptor.apply(tr["enc"], flow) * 2.0 - 1.0
            if not cfg.encoder_grad_through_vae:
                pseudo_rgb = jax.lax.stop_gradient(pseudo_rgb)
            mu, logvar = vae.apply(vp_frozen, pseudo_rgb,
                                   method=WanVAE.encode)
            logvar_c = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar_c)
            z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)

            recon = vae.apply(vp_dec, z, clip=False, method=WanVAE.decode)
            out = dec_adaptor.apply(tr["dec"], recon)

            err = out.astype(jnp.float32) - flow
            rec = jnp.abs(err) if cfg.rec_loss == "l1" else jnp.square(err)
            nll = jnp.sum(rec) / b
            kl = 0.5 * jnp.sum(jnp.square(mu) + jnp.exp(logvar_c) - 1.0
                               - logvar_c) / b
            return nll + cfg.kl_scale * kl, (nll, kl)

        (loss, (nll, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        grads, _ = optax.clip_by_global_norm(
            cfg.max_grad_norm).update(grads, optax.EmptyState())
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss, "nll_loss": nll,
                                      "kl_loss": kl}

    return step

"""4D-STraG training harness: real conditioning, bucketed batches, sharded
step, validation sampling, metrics, checkpoint/resume.

This is the TPU equivalent of the *wiring* of the reference trainer
(scripts/4D_STraG_training/train_wan.py:1619-2091) — everything between the
dataset and the jitted train step:

- per-sample text with 10% dropout to the empty prompt
  (wan_dataset.py:830), encoded by tokenizer+umT5;
- CLIP features of the first RGB frame with 2% dropout to zeros
  (train_wan.py:1845-1854);
- OmniMAE MPM patch tokens of the first frame (the DiT's first_frame input,
  train_wan.py:1949, wan_transformer4d.py:1127-1158);
- y = [control latents (2% dropout, :1791-1798), zero ref slot (the
  ref_latents_conv_in assignment is commented out in the reference,
  :1819-1827), depth latents] -> 48 channels;
- batch sharded over the mesh's data axis; params/optimizer FSDP-sharded;
- periodic validation sampling through the real control pipeline
  (log_validation, train_wan.py:94-153) written via save_videos_grid;
- JSONL/TensorBoard scalar metrics (train_wan.py:2025);
- orbax checkpoints carrying sampler position for data-order resume.

Multi-stream VAE/compute overlap (train_wan.py:1609-1615, 1779-1784 uses
two CUDA streams): under XLA this needs no explicit streams — dispatch is
asynchronous, so the VAE encodes of batch N+1 (prepare_batch) are enqueued
while the jitted train step of batch N still executes; the loop only
blocks on a scalar readback every ``log_steps``. The reference's
stream-synchronisation machinery therefore collapses into "don't block
between steps", which the loop below is careful to do.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sceneflow import SceneFlowSample
from ..parallel.mesh import AXIS_DATA, data_sharding, fsdp_sharding
from ..utils.metrics import MetricsLogger
from .checkpoint import CheckpointManager
from .train_straag import (StraagTrainConfig, make_split_train_step,
                           make_train_step, should_skip_update)


@dataclasses.dataclass
class StraagRunConfig:
    output_dir: str = "straag_ckpt"
    batch_size: int = 1
    max_steps: int = 10000
    checkpointing_steps: int = 500
    validation_steps: int = 0          # 0 = off
    log_steps: int = 50
    control_dropout: float = 0.02      # train_wan.py:1791-1798
    clip_dropout: float = 0.02         # train_wan.py:1849-1853
    text_dropout: float = 0.1          # wan_dataset.py:830
    seed: int = 42
    resume: bool = False
    # reference --checkpoints_total_limit (train_wan.py:2028-2052 rotation)
    checkpoints_total_limit: int = 2


class StraagTrainer:
    """Wires encoders + VAE + DiT into the jitted train step.

    All model pieces arrive as ready callables/params so tiny test doubles
    drop in; the CLI builds them from real checkpoints."""

    def __init__(self, dit, dit_params, vae, vae_params,
                 encoder_adaptor, encoder_adaptor_params,
                 encode_text: Callable[[Sequence[str]], jnp.ndarray],
                 mesh, tcfg: StraagTrainConfig, run_cfg: StraagRunConfig,
                 encode_clip: Optional[Callable] = None,
                 extract_mpm: Optional[Callable] = None,
                 tx=None, validation_pipeline=None,
                 trainable_filter: Optional[Callable[[str], bool]] = None,
                 report_grad_norms: bool = False,
                 split_step: bool = False):
        import optax

        self.dit, self.vae = dit, vae
        self.vae_params = vae_params
        self.enc, self.enc_params = encoder_adaptor, encoder_adaptor_params
        self.encode_text = encode_text
        self.encode_clip = encode_clip
        self.extract_mpm = extract_mpm
        self.mesh = mesh
        self.tcfg, self.run_cfg = tcfg, run_cfg
        self.validation_pipeline = validation_pipeline

        self.tx = tx if tx is not None else optax.adamw(tcfg.learning_rate)
        if tcfg.grad_accum_steps > 1:
            # mean-gradient accumulation over k micro-steps (reference
            # --gradient_accumulation_steps); wraps the caller's tx
            # (CAME / two-tier LR) too.  The dynamic grad clamp moves
            # INTO the chain so it clips the accumulated MEAN gradient
            # once per optimizer step (accelerate clips under
            # sync_gradients, train_wan.py:1991-2001) instead of each
            # micro-gradient; clip_in_tx tells make_train_step to skip
            # its per-micro-step clamp
            import dataclasses

            from .optim import dynamic_clip_transform

            self.tx = optax.MultiSteps(
                optax.chain(
                    dynamic_clip_transform(
                        tcfg.max_grad_norm,
                        decay_steps=tcfg.grad_clip_decay_steps),
                    self.tx),
                every_k_schedule=tcfg.grad_accum_steps)
            tcfg = dataclasses.replace(tcfg, clip_in_tx=True)
            self.tcfg = tcfg
        # PRIVATE copies: the step jit donates params/opt/ema buffers, so
        # the trainer must own them exclusively — device_put may alias the
        # caller's arrays when the sharding already matches, and a donated
        # alias would delete the caller's tree out from under them
        self.params = jax.tree_util.tree_map(
            lambda a, s: jnp.copy(jax.device_put(a, s)),
            dit_params, fsdp_sharding(dit_params, mesh))
        self.opt_state = self.tx.init(self.params)
        self.opt_state = jax.tree_util.tree_map(
            jax.device_put, self.opt_state,
            fsdp_sharding(self.opt_state, mesh))
        # EMA must be a DISTINCT buffer copy — params and ema are both
        # donated by the step jit, and aliased buffers would be donated
        # twice (Execute() error)
        self.ema = jax.tree_util.tree_map(jnp.copy, self.params) \
            if tcfg.use_ema else None
        from ..models.vae_streaming import encode_streamed

        # donate params/opt/ema: without donation the update holds OLD and
        # NEW copies of 3x model-size state simultaneously (~19 GiB at
        # 1.3B + AdamW on bf16) and OOMs the 16 GiB chip
        self.split_step = split_step
        if split_step:
            # two-jit step (value_and_grad || AdamW update) with the
            # abnormal-loss skip on the host — required on stacks whose
            # server-side compiler rejects the fused named-save-remat +
            # optimizer module (see make_split_train_step), and the only
            # mode where the flash remat policies run at 1.3B on one
            # 16 GiB chip.  Costs one scalar loss readback per step, so
            # host-prep/device overlap shrinks by the readback latency.
            self.grad_fn, self.update_fn = make_split_train_step(
                dit, self.tx, tcfg, trainable_filter=trainable_filter,
                report_grad_norms=report_grad_norms)
            self.step_fn = self._split_step_call
        else:
            self.step_fn = jax.jit(make_train_step(
                dit, self.tx, tcfg, trainable_filter=trainable_filter,
                report_grad_norms=report_grad_norms),
                donate_argnums=(0, 1, 2))
        # streamed (lax.scan) encode, matching pipelines/base.py and
        # train_vism: the fused full-sequence encoder materialises ~2 GB
        # activations per layer at 49f 368x512 and OOMs a 16 GiB chip
        self._encode = jax.jit(
            lambda vp, x: encode_streamed(vae, vp, x)[0])
        self.rng = np.random.RandomState(run_cfg.seed)
        self.key = jax.random.PRNGKey(run_cfg.seed)
        self.global_step = 0

    def _split_step_call(self, params, opt_state, ema, batch, rng,
                         global_step):
        """step_fn-compatible wrapper over the two-jit split step: the
        abnormal-loss batch skip runs on the HOST (the reference's own
        ordering — decide before optimizer.step), so a skipped batch never
        dispatches the update at all."""
        loss, grads = self.grad_fn(params, batch, rng, global_step)
        if should_skip_update(float(loss), global_step, self.tcfg):
            del grads
            return params, opt_state, ema, {"loss": loss,
                                            "grad_norm": 0.0,
                                            "skipped": True}
        params, opt_state, ema, m = self.update_fn(params, opt_state, ema,
                                                   grads, global_step)
        return params, opt_state, ema, {"loss": loss, "skipped": False,
                                        **m}

    # ---- batch assembly (host + frozen towers) --------------------------
    def prepare_batch(self, samples: Sequence[SceneFlowSample],
                      prompts: Sequence[str]) -> dict:
        """Stack samples (one bucket shape) -> jitted-step batch dict."""
        cfg = self.dit.cfg
        rc = self.run_cfg

        flow = jnp.asarray(np.stack([s.flow for s in samples]))
        control = jnp.asarray(np.stack([s.control_video for s in samples]))
        t_frames = flow.shape[1]
        depth = jnp.asarray(np.stack(
            [np.repeat(s.depth_image, t_frames, axis=0) for s in samples]))
        rgb01 = jnp.asarray(np.stack(
            [s.first_frame_rgb for s in samples]))

        # flow pixels -> pseudo-RGB -> frozen-VAE latents (train_wan.py:1756)
        pseudo = self.enc.apply(self.enc_params, flow) * 2.0 - 1.0
        latents = self._encode(self.vae_params, pseudo)
        control_lat = self._encode(self.vae_params, control)
        depth_lat = self._encode(self.vae_params, depth)

        # --add_full_ref_image_in_self_attention (train_wan.py:1816-1836):
        # the ref image's first LATENT frame, prepended as ref_conv tokens,
        # zeroed with 2% dropout.  Only produced when the DiT actually has
        # the ref_conv path (the reference's shipped 4D config leaves
        # add_ref_conv off, making its own flag a no-op).  The control
        # video is the repeated first frame, so its frame-0 latents ARE
        # the ref latents (captured before the control dropout below).
        full_ref = None
        if cfg.ref_conv:
            keep_r = np.asarray(
                [self.rng.choice([1.0, 0.0], p=[0.98, 0.02])
                 for _ in samples], np.float32)
            full_ref = control_lat[:, 0] * keep_r[:, None, None, None]

        # 2% control dropout per sample (train_wan.py:1791-1798)
        keep = np.asarray([self.rng.choice([0.0, 1.0], p=[rc.control_dropout,
                                                          1 - rc.control_dropout])
                           for _ in samples], np.float32)
        control_lat = control_lat * keep[:, None, None, None, None]

        ref_slot = jnp.zeros_like(latents)   # ref assignment commented out
        y = jnp.concatenate([control_lat, ref_slot, depth_lat], axis=-1)

        # text with 10% dropout to "" (wan_dataset.py:830)
        prompts = [("" if self.rng.rand() < rc.text_dropout else p)
                   for p in prompts]
        context = self.encode_text(prompts).astype(jnp.float32)

        batch = {"latents": latents, "y": y, "context": context}
        if full_ref is not None:
            batch["full_ref"] = full_ref

        if self.encode_clip is not None:
            clip_fea = self.encode_clip(rgb01 * 2.0 - 1.0)
            keep_c = np.asarray(
                [self.rng.choice([0.0, 1.0], p=[rc.clip_dropout,
                                                1 - rc.clip_dropout])
                 for _ in samples], np.float32)
            batch["clip_fea"] = clip_fea * keep_c[:, None, None]
        if self.extract_mpm is not None and cfg.motion_guidance:
            batch["mpm_features"] = self.extract_mpm(rgb01)

        # shard over the data axis
        batch = {k: jax.device_put(v, data_sharding(self.mesh, v.ndim))
                 for k, v in batch.items()}
        return batch

    # ---- train loop ------------------------------------------------------
    def train(self, sample_iterator: Iterator, prompt_for=None,
              extra_state: Optional[Callable[[], dict]] = None,
              restore_state: Optional[Callable[[dict], None]] = None):
        """sample_iterator yields (samples, prompts) batches.

        extra_state()/restore_state(d) hook sampler position into the
        checkpoint for exact data-order resume."""
        rc = self.run_cfg
        os.makedirs(rc.output_dir, exist_ok=True)
        metrics = MetricsLogger(rc.output_dir)
        mgr = CheckpointManager(rc.output_dir,
                                max_to_keep=rc.checkpoints_total_limit)

        if rc.resume and mgr.latest_step() is not None:
            out = mgr.restore(params_like=self.params,
                              opt_state_like=self.opt_state,
                              ema_like=self.ema, with_extra=True)
            self.params = out["params"]
            self.opt_state = out["opt_state"]
            if self.ema is not None:
                self.ema = out["ema"]
            extra = out.get("extra") or {}
            self.global_step = extra.get("global_step", 0)
            if restore_state and "data" in extra:
                restore_state(extra["data"])

        for samples, prompts in sample_iterator:
            if self.global_step >= rc.max_steps:
                break
            batch = self.prepare_batch(samples, prompts)
            self.key, sub = jax.random.split(self.key)
            (self.params, self.opt_state, self.ema,
             step_metrics) = self.step_fn(self.params, self.opt_state,
                                          self.ema, batch, sub,
                                          self.global_step)
            self.global_step += 1

            if self.global_step % rc.log_steps == 0 \
                    or self.global_step == 1:
                grad_norms = step_metrics.pop("grad_norms", None)
                scal = {k: float(v) for k, v in step_metrics.items()}
                metrics.log(self.global_step, scal, prefix="train")
                if grad_norms is not None:
                    # --report_model_info parity (train_wan.py:2003-2012)
                    metrics.log(self.global_step,
                                {k: float(v)
                                 for k, v in grad_norms.items()},
                                prefix="grad_norm")
                print(f"step {self.global_step}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in scal.items()))
            if rc.validation_steps and \
                    self.global_step % rc.validation_steps == 0:
                self._validate(samples[0], prompts[0], metrics)
            if self.global_step % rc.checkpointing_steps == 0:
                extra = {"global_step": self.global_step}
                if extra_state:
                    extra["data"] = extra_state()
                mgr.save(self.global_step, self.params,
                         opt_state=self.opt_state, ema=self.ema,
                         extra=extra)
        metrics.close()
        mgr.close()
        return self.params, self.ema

    def _validate(self, sample: SceneFlowSample, prompt: str,
                  metrics: MetricsLogger):
        """Periodic end-to-end sampling through the real control pipeline
        (log_validation, train_wan.py:94-153); writes a video grid."""
        if self.validation_pipeline is None:
            return
        from ..utils.artifacts import save_videos_grid

        pipe = self.validation_pipeline
        ctx = self.encode_text([prompt])
        neg = self.encode_text([""])
        clip_fea = None
        if self.encode_clip is not None:
            clip_fea = self.encode_clip(
                jnp.asarray(sample.first_frame_rgb)[None] * 2.0 - 1.0)
        mpm = None
        if self.extract_mpm is not None and self.dit.cfg.motion_guidance:
            mpm = self.extract_mpm(
                jnp.asarray(sample.first_frame_rgb)[None])
        video = pipe(self.params, self.vae_params,
                     jax.random.PRNGKey(self.run_cfg.seed),
                     ctx, neg_embeds=neg,
                     control_video=jnp.asarray(sample.control_video)[None],
                     depth_image=jnp.asarray(sample.depth_image)[None],
                     clip_fea=clip_fea, mpm_features=mpm,
                     output_type="no_normalize")
        path = os.path.join(self.run_cfg.output_dir,
                            f"validation_{self.global_step}.gif")
        vis = np.asarray((video + 1.0) * 0.5)
        save_videos_grid(path, np.clip(vis, 0, 1))
        metrics.log(self.global_step, {"validation_written": 1.0})

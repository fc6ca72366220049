#!/usr/bin/env python
"""VAE trajectory-adaptor training CLI (the TPU equivalent of
scripts/4D_STraG_training/train_vae.py:583).

Scene-flow pkls (vae_dataset.py conventions) -> one of the four coordinate
normalizations (:117-170) -> jitted adaptor train step (L1 + 1e-6 KL,
train_vae.py:173-187) with windowed statistical outlier skip (:71-106) ->
orbax checkpoints + JSONL/TensorBoard metrics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_list", required=True,
                   help="txt of video paths (vae_dataset.py load_sceneflow)")
    p.add_argument("--posfix", default="")
    p.add_argument("--data_root", default=None)
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--encoder_adaptor", default=None,
                   help="optional torch .bin to initialise from")
    p.add_argument("--decoder_adaptor", default=None)
    p.add_argument("--output_dir", default="vae_adaptor_ckpt")
    p.add_argument("--normalize", default="track_z",
                   choices=["track", "track_first_frame", "track_z",
                            "delta"])
    p.add_argument("--num_frames", type=int, default=17)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=5e-6)
    # optimizer hyperparams + schedule + clip (reference train_vae.py
    # :383-385,:481,:535-545,:663-668 — its live subset of the
    # diffusers-style flags)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="reference --gradient_accumulation_steps")
    p.add_argument("--kl_scale", type=float, default=1e-6)
    p.add_argument("--rec_loss", default="l1", choices=["l1", "l2"])
    p.add_argument("--finetune_vae_decoder", action="store_true",
                   default=True)
    p.add_argument("--no_finetune_vae_decoder", dest="finetune_vae_decoder",
                   action="store_false")
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--log_steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true")
    # reference --loss_skip_std_multiplier/--loss_skip_min_samples
    # (train_vae.py:71-106): tune the windowed statistical outlier skip
    p.add_argument("--loss_skip_std_multiplier", type=float, default=6.0)
    p.add_argument("--loss_skip_min_samples", type=int, default=20)
    # absolute ceiling + degenerate-std fallback (train_vae.py:82,93-97)
    p.add_argument("--loss_skip_absolute_threshold", type=float,
                   default=1e7)
    p.add_argument("--loss_skip_multiplier", type=float, default=10.0)
    p.add_argument("--loss_skip_window", type=int, default=100)
    return p.parse_args()


def run_training(vae, vae_params, enc, enc_params, dec, dec_params,
                 sample_iter, args):
    """Core loop, callable from tests with tiny models. sample_iter yields
    flow targets [T, H, W, 3] (already normalized)."""
    import jax
    import jax.numpy as jnp
    import optax

    from more4d_tpu.train.checkpoint import CheckpointManager
    from more4d_tpu.train.optim import LossOutlierTracker
    from more4d_tpu.train.train_vae import (VAEAdaptorTrainConfig,
                                            make_vae_adaptor_train_step)
    from more4d_tpu.utils.metrics import MetricsLogger

    accum = max(getattr(args, "grad_accum_steps", 1), 1)
    clipn = getattr(args, "max_grad_norm", 1.0)
    tcfg = VAEAdaptorTrainConfig(
        learning_rate=args.learning_rate, kl_scale=args.kl_scale,
        finetune_decoder=args.finetune_vae_decoder, rec_loss=args.rec_loss,
        # with accumulation the clip must act on the accumulated MEAN
        # gradient (reference clips at the sync step, train_vae.py:481),
        # so it moves into the tx chain under MultiSteps
        max_grad_norm=(1e30 if accum > 1 else clipn))
    trainable = {"enc": enc_params, "dec": dec_params}
    if args.finetune_vae_decoder:
        trainable["vae_decoder"] = {
            "decoder": vae_params["params"]["decoder"],
            "conv2": vae_params["params"]["conv2"]}
    from more4d_tpu.train.optim import make_lr_schedule

    tx = optax.adamw(
        make_lr_schedule(args.learning_rate,
                         getattr(args, "lr_scheduler", "constant"),
                         getattr(args, "lr_warmup_steps", 0),
                         max(args.max_steps // accum, 1)),
        b1=getattr(args, "adam_beta1", 0.9),
        b2=getattr(args, "adam_beta2", 0.999),
        eps=getattr(args, "adam_epsilon", 1e-8),
        weight_decay=getattr(args, "adam_weight_decay", 1e-2))
    if accum > 1:
        tx = optax.MultiSteps(
            optax.chain(optax.clip_by_global_norm(clipn), tx),
            every_k_schedule=accum)
    opt_state = tx.init(trainable)
    step_fn = jax.jit(make_vae_adaptor_train_step(enc, dec, vae, tx, tcfg))

    os.makedirs(args.output_dir, exist_ok=True)
    metrics = MetricsLogger(args.output_dir)
    mgr = CheckpointManager(args.output_dir)
    # getattr defaults keep the loop callable with a minimal args
    # namespace (tests construct SimpleNamespace)
    tracker = LossOutlierTracker(
        window=getattr(args, "loss_skip_window", 100),
        sigma=getattr(args, "loss_skip_std_multiplier", 6.0),
        warmup=getattr(args, "loss_skip_min_samples", 20),
        absolute_threshold=getattr(args, "loss_skip_absolute_threshold",
                                   1e7),
        multiplier=getattr(args, "loss_skip_multiplier", 10.0))
    key = jax.random.PRNGKey(args.seed)
    global_step = 0
    if args.resume and mgr.latest_step() is not None:
        out = mgr.restore(params_like=trainable, opt_state_like=opt_state,
                          with_extra=True)
        trainable, opt_state = out["params"], out["opt_state"]
        global_step = (out.get("extra") or {}).get("global_step", 0)

    for flow in sample_iter:
        if global_step >= args.max_steps:
            break
        batch = {"flow": jnp.asarray(flow)[None]}
        key, sub = jax.random.split(key)
        new_tr, new_opt, m = step_fn(trainable, opt_state, vae_params,
                                     batch, sub)
        loss = float(m["loss"])
        # windowed mean+6sigma outlier skip (train_vae.py:71-106): drop the
        # update, keep tracking
        if tracker.should_skip(loss):
            metrics.log(global_step + 1, {"skipped_outlier": 1.0,
                                          "loss": loss}, prefix="train")
        else:
            trainable, opt_state = new_tr, new_opt
        global_step += 1
        if global_step % args.log_steps == 0 or global_step == 1:
            metrics.log(global_step,
                        {k: float(v) for k, v in m.items()},
                        prefix="train")
            print(f"step {global_step}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in m.items()))
        if global_step % args.checkpointing_steps == 0:
            mgr.save(global_step, trainable, opt_state=opt_state,
                     extra={"global_step": global_step})
    metrics.close()
    mgr.close()
    return trainable


def main():
    args = parse_args()
    import torch

    from more4d_tpu.config import VAEConfig
    from more4d_tpu.convert.vae_torch import load_wan_vae
    from more4d_tpu.data.vae_flow import (VAEFlowDataset,
                                          normalize_vae_target)
    from more4d_tpu.models.adaptors import (VAEDecoderAdaptor,
                                            VAEEncoderAdaptor,
                                            convert_adaptor_state_dict)
    from more4d_tpu.models.wan_vae import WanVAE

    import jax
    import jax.numpy as jnp

    vae = WanVAE(VAEConfig())
    vae_params = load_wan_vae(args.vae_ckpt)
    enc, dec = VAEEncoderAdaptor(), VAEDecoderAdaptor()
    dummy = jnp.zeros((1, 1, args.height, args.width, 3), jnp.float32)
    if args.encoder_adaptor:
        enc_params = convert_adaptor_state_dict(
            torch.load(args.encoder_adaptor, map_location="cpu",
                       weights_only=True), decoder=False)
    else:
        enc_params = enc.init(jax.random.PRNGKey(args.seed), dummy)
    if args.decoder_adaptor:
        dec_params = convert_adaptor_state_dict(
            torch.load(args.decoder_adaptor, map_location="cpu",
                       weights_only=True), decoder=True)
    else:
        dec_params = dec.init(jax.random.PRNGKey(args.seed + 1), dummy)

    ds = VAEFlowDataset(args.video_list, args.posfix, args.data_root,
                        args.height, args.width, args.num_frames)
    rng = np.random.RandomState(args.seed)

    def samples():
        while True:
            idx = int(rng.randint(len(ds)))
            try:
                s = ds[idx]
                yield normalize_vae_target(s, args.normalize,
                                           args.num_frames, args.height,
                                           args.width)
            except Exception as e:  # skip-and-continue
                print(f"skipping {ds.paths[idx]}: {e}")

    from more4d_tpu.data.prefetch import prefetch

    run_training(vae, vae_params, enc, enc_params, dec, dec_params,
                 prefetch(samples(), depth=4, num_workers=2), args)


if __name__ == "__main__":
    main()

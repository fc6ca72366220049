#!/usr/bin/env python
"""4D-STraG training CLI (the TPU equivalent of
scripts/4D_STraG_training/train_wan.py).

Data flow per step (reference §3.1): sceneflow pkl -> depth-guided
normalization -> encoder-adaptor -> frozen VAE encode (latents + 48ch
conditioning with 2% control dropout) -> jitted FSDP-sharded train step
(flow-matching loss, stratified timesteps, EMA, loss guards) -> orbax
checkpoints with data-order resume.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True,
                   help="directory of *_dt3d_pred.pkl sceneflow files")
    p.add_argument("--prompts_json", default=None)
    p.add_argument("--pretrained_ckpt", required=True)
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--t5_ckpt", required=True)
    p.add_argument("--tokenizer", default="google/umt5-xxl")
    p.add_argument("--encoder_adaptor", required=True)
    p.add_argument("--output_dir", default="straag_ckpt")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--max_grad_norm", type=float, default=0.05)
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--motion_sub_loss", action="store_true")
    p.add_argument("--control_dropout", type=float, default=0.02)
    p.add_argument("--text_dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_size", default="14b", choices=["14b", "1.3b"])
    p.add_argument("--resume", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from more4d_tpu.config import VAEConfig, dit_14b, dit_1_3b
    from more4d_tpu.convert.dit_torch import load_wan_dit
    from more4d_tpu.convert.vae_torch import load_wan_vae
    from more4d_tpu.data import ResumableSampler
    from more4d_tpu.data.sceneflow import (load_sceneflow_pickle,
                                           prepare_straag_sample)
    from more4d_tpu.models import WanDiT
    from more4d_tpu.models.adaptors import (VAEEncoderAdaptor,
                                            convert_adaptor_state_dict)
    from more4d_tpu.models.wan_vae import WanVAE
    from more4d_tpu.parallel import create_mesh, shard_params
    from more4d_tpu.train import make_adamw
    from more4d_tpu.train.checkpoint import CheckpointManager
    from more4d_tpu.train.train_straag import (StraagTrainConfig,
                                               make_train_step)

    make_dit = dit_14b if args.model_size == "14b" else dit_1_3b
    cfg = make_dit(motion_guidance=True, in_dim=64, model_type="i2v",
                   remat=True)
    dit = WanDiT(cfg)
    vae = WanVAE(VAEConfig())

    import torch

    params = load_wan_dit(args.pretrained_ckpt, cfg)
    vae_params = load_wan_vae(args.vae_ckpt)
    enc = VAEEncoderAdaptor()
    enc_params = convert_adaptor_state_dict(
        torch.load(args.encoder_adaptor, map_location="cpu",
                   weights_only=True), decoder=False)

    mesh = create_mesh()
    params = shard_params(params, mesh)

    world = mesh.shape["data"]
    tcfg = StraagTrainConfig(learning_rate=args.learning_rate,
                             max_grad_norm=args.max_grad_norm,
                             motion_sub_loss=args.motion_sub_loss,
                             world_size=world)
    tx = make_adamw(args.learning_rate)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(lambda x: x, params)
    step_fn = jax.jit(make_train_step(dit, tx, tcfg))

    files = sorted(glob.glob(os.path.join(args.data_dir,
                                          "*_dt3d_pred.pkl")))
    sampler = ResumableSampler(len(files), seed=args.seed)
    mgr = CheckpointManager(args.output_dir)
    global_step = 0
    if args.resume and mgr.latest_step() is not None:
        out = mgr.restore(params_like=params, opt_state_like=opt_state,
                          ema_like=ema, with_extra=True)
        params, opt_state, ema = out["params"], out["opt_state"], out["ema"]
        sampler.load_state_dict(out["extra"]["sampler"])
        global_step = out["extra"]["global_step"]

    encode = jax.jit(lambda vp, x: vae.apply(vp, x, method=WanVAE.encode)[0])
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    it = iter(sampler)
    while global_step < args.max_steps:
        # ---- host-side sample assembly
        idx = next(it)
        coords, colors = load_sceneflow_pickle(files[idx], args.height,
                                               args.width)
        sample = prepare_straag_sample(coords, colors,
                                       max_num_frames=args.num_frames)
        if sample is None:
            continue

        pseudo = enc.apply(enc_params,
                           jnp.asarray(sample.flow)[None]) * 2 - 1
        latents = encode(vae_params, pseudo)
        control = encode(vae_params, jnp.asarray(sample.control_video)[None])
        if rng.rand() < args.control_dropout:   # 2% dropout (:1791-1798)
            control = control * 0
        start = jnp.zeros_like(latents)
        depth_lat = encode(vae_params, jnp.broadcast_to(
            jnp.asarray(sample.depth_image)[None],
            (1, args.num_frames) + sample.depth_image.shape[1:]))
        y = jnp.concatenate([control, start, depth_lat], axis=-1)

        # text/clip/mpm embeddings: precomputed per-dataset in practice;
        # plug the encoders from scripts/infer.py here.
        batch = {"latents": latents, "y": y,
                 "context": jnp.zeros((1, cfg.text_len, cfg.text_dim),
                                      jnp.float32)}

        key, sub = jax.random.split(key)
        params, opt_state, ema, metrics = step_fn(
            params, opt_state, ema, batch, sub, global_step)
        global_step += 1
        if global_step % 50 == 0:
            print(f"step {global_step}: loss={float(metrics['loss']):.4f} "
                  f"gnorm={float(metrics['grad_norm']):.4f}")
        if global_step % args.checkpointing_steps == 0:
            mgr.save(global_step, params, opt_state=opt_state, ema=ema,
                     extra={"global_step": global_step,
                            "sampler": sampler.state_dict()})


if __name__ == "__main__":
    main()

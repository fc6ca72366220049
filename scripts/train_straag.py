#!/usr/bin/env python
"""4D-STraG training CLI (the TPU equivalent of
scripts/4D_STraG_training/train_wan.py).

Per step (reference §3.1): sceneflow pkl -> depth-guided normalization ->
encoder-adaptor -> frozen VAE encode (latents + 48ch conditioning, 2%
control dropout) -> REAL conditioning (tokenizer+umT5 text with 10%
dropout, CLIP first-frame features with 2% dropout, OmniMAE MPM patch
tokens) -> jitted FSDP+DP-sharded train step (flow-matching loss,
stratified timesteps, EMA, loss guards) -> orbax checkpoints with
data-order resume, JSONL/TensorBoard metrics, periodic validation
sampling through the control pipeline.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True,
                   help="directory of *_dt3d_pred.pkl sceneflow files")
    p.add_argument("--prompts_json", default=None,
                   help="json mapping pkl basename -> text prompt")
    p.add_argument("--pretrained_ckpt", required=True)
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--t5_ckpt", default=None)
    p.add_argument("--tokenizer", default="google/umt5-xxl")
    p.add_argument("--clip_ckpt", default=None)
    p.add_argument("--omnimae_ckpt", default=None)
    p.add_argument("--encoder_adaptor", required=True)
    p.add_argument("--output_dir", default="straag_ckpt")
    p.add_argument("--batch_size", type=int, default=1,
                   help="per-step batch; sharded over the mesh data axis")
    p.add_argument("--mesh", default=None,
                   help="device-mesh topology, e.g. 'data=2,fsdp=4' "
                        "(-1 absorbs remaining devices; default: all "
                        "devices on the fsdp axis). The accelerate/"
                        "DeepSpeed-launcher equivalent — see "
                        "docs/MIGRATION.md §5")
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="micro-batch gradient accumulation: apply the "
                        "mean gradient every k-th step (reference "
                        "--gradient_accumulation_steps)")
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="keep an EMA of the weights (reference "
                        "--use_ema; --no-use_ema saves the memory)")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    # LR schedule + Adam hyperparams: defaults = the reference's SHIPPED
    # launch values (train_wan.sh:27-35), not its argparse defaults
    p.add_argument("--lr_scheduler", default="constant_with_warmup",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=3e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-10)
    p.add_argument("--checkpoints_total_limit", type=int, default=2,
                   help="checkpoint rotation depth (orbax max_to_keep; "
                        "reference --checkpoints_total_limit)")
    # timestep sampling density + SD3 loss weighting
    # (train_wan.py:1895-1902,1964). Default = the reference LAUNCHER's
    # --uniform_sampling (train_wan.sh); --no-uniform_sampling switches to
    # the density path under --weighting_scheme
    p.add_argument("--uniform_sampling",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="rank-stratified uniform timestep sampling; "
                        "--no-uniform_sampling uses the SD3 density "
                        "sampler under --weighting_scheme")
    p.add_argument("--weighting_scheme", default="none",
                   choices=["sigma_sqrt", "logit_normal", "mode",
                            "cosmap", "none"],
                   help="SD3 sampling-density / loss-weighting scheme")
    p.add_argument("--logit_mean", type=float, default=0.0)
    p.add_argument("--logit_std", type=float, default=1.0)
    p.add_argument("--mode_scale", type=float, default=1.29)
    p.add_argument("--train_sampling_steps", type=int, default=1000,
                   help="timestep-grid size for the stratified sampler "
                        "(reference --train_sampling_steps -> "
                        "DiscreteSampling, train_wan.py:1617)")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "came"],
                   help="came = the reference's --use_came path")
    p.add_argument("--trainable_modules", default=None,
                   help="comma-separated name substrings; params whose "
                        "path contains none are frozen (the reference's "
                        "--trainable_modules, train_wan.py:949-954). "
                        "Default: full fine-tune")
    p.add_argument("--low_lr_names", default=None,
                   help="regex over param paths trained at "
                        "learning_rate*low_lr_ratio (2-tier LR groups, "
                        "train_wan.py:1091-1142)")
    p.add_argument("--low_lr_ratio", type=float, default=0.1)
    p.add_argument("--allow_dummy_text", action="store_true",
                   help="permit training without --t5_ckpt (zero text "
                        "embeddings; smoke runs only)")
    # reference: frozen models load at accelerate's mixed_precision dtype
    # (train_wan.py:796-816 under weight_dtype, train_wan.sh bf16); the
    # trainable DiT keeps fp32 master params with bf16 compute either way
    p.add_argument("--frozen_dtype", default="bf16",
                   choices=["bf16", "fp32"],
                   help="storage dtype for the FROZEN towers "
                        "(VAE/T5/CLIP/OmniMAE)")
    p.add_argument("--report_model_info", action="store_true",
                   help="log per-parameter grad norms "
                        "(train_wan.py:2003-2012)")
    # selective activation checkpointing (reference ac_handle.py); the
    # flash policies need --split_step on stacks whose server compiler
    # rejects the fused named-save-remat + optimizer module, and the
    # '_offload' variants park the residuals in pinned host memory
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots", "flash", "flash_lite",
                            "flash_ffn", "flash_offload",
                            "flash_lite_offload", "flash_ffn_offload"])
    p.add_argument("--split_step", action="store_true",
                   help="compile value_and_grad and the optimizer update "
                        "as two jits with the abnormal-loss skip on the "
                        "host (make_split_train_step)")
    p.add_argument("--max_grad_norm", type=float, default=0.05)
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--validation_steps", type=int, default=0)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--buckets", default=None,
                   help="comma-separated HxW aspect buckets, e.g. "
                        "'368x512,416x416,512x368' (default: single "
                        "canonical shape)")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--motion_sub_loss", action="store_true")
    p.add_argument("--control_dropout", type=float, default=0.02)
    p.add_argument("--text_dropout", type=float, default=0.1)
    p.add_argument("--skip_large_depth",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="drop samples whose depth range exceeds the "
                        "threshold (reference --skip_large_depth, "
                        "wan_dataset.py:885-890)")
    p.add_argument("--max_samples", type=int, default=None,
                   help="cap the dataset to its first N pkls (reference "
                        "--max_sample_dataset/--max_train_samples)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_size", default="14b", choices=["14b", "1.3b"])
    p.add_argument("--resume", action="store_true")
    return p.parse_args()


def make_batch_iterator(files, prompts, sampler, batch_size, height, width,
                        num_frames, buckets=None, skip_large_depth=True):
    """Group sceneflow samples into batches.

    Default: one fixed canonical shape (the reference's --fix_sample_size
    path, train_wan.py:1298 — every distinct shape is an XLA recompile).
    With ``buckets`` (list of (H, W)): samples are resized to the closest
    bucket by aspect ratio and batches are grouped per bucket
    (AspectRatioBatchImageVideoSampler semantics, bucket_sampler.py:270) —
    at most len(buckets) compiled shapes."""
    from more4d_tpu.data.sceneflow import (load_sceneflow_pickle,
                                           prepare_straag_sample)

    pools = {}

    def bucket_for(h, w):
        if not buckets:
            return (height, width)
        ratio = h / w
        return min(buckets, key=lambda bw: abs(bw[0] / bw[1] - ratio))

    def gen():
        for idx in sampler:
            path = files[idx]
            try:
                coords, colors = load_sceneflow_pickle(path, height, width)
                bh, bw = bucket_for(*coords.shape[1:3])
                if coords.shape[1:3] != (bh, bw):
                    import cv2

                    coords = np.stack([
                        cv2.resize(c, (bw, bh),
                                   interpolation=cv2.INTER_LINEAR)
                        for c in coords])
                    colors = cv2.resize(colors, (bw, bh),
                                        interpolation=cv2.INTER_LINEAR)
                sample = prepare_straag_sample(
                    coords, colors, max_num_frames=num_frames,
                    skip_large_depth=skip_large_depth)
            except Exception as e:  # bad pkl: skip-and-continue (:796-810)
                print(f"skipping {path}: {e}")
                continue
            if sample is None:
                continue
            name = os.path.splitext(os.path.basename(path))[0]
            pool = pools.setdefault((bh, bw), ([], []))
            pool[0].append(sample)
            pool[1].append(prompts.get(name, ""))
            if len(pool[0]) == batch_size:
                yield pool[0][:], pool[1][:]
                pool[0].clear()
                pool[1].clear()

    return gen()


def main():
    args = parse_args()
    import jax

    from more4d_tpu.config import (PipelineConfig, VAEConfig, dit_14b,
                                   dit_1_3b)
    from more4d_tpu.convert.dit_torch import load_wan_dit
    from more4d_tpu.convert.vae_torch import load_wan_vae
    from more4d_tpu.data import ResumableSampler
    from more4d_tpu.infer.encoders import build_encoders
    from more4d_tpu.models import WanDiT
    from more4d_tpu.models.adaptors import VAEEncoderAdaptor, load_adaptor
    from more4d_tpu.models.wan_vae import WanVAE
    from more4d_tpu.parallel import create_mesh, parse_mesh_spec
    from more4d_tpu.pipelines import WanControlPipeline
    from more4d_tpu.train.harness import (StraagRunConfig, StraagTrainer)
    from more4d_tpu.train.train_straag import StraagTrainConfig

    make_dit = dit_14b if args.model_size == "14b" else dit_1_3b
    cfg = make_dit(motion_guidance=True, in_dim=64, model_type="i2v",
                   remat=True, remat_policy=args.remat_policy)
    import jax.numpy as jnp

    fdt = jnp.bfloat16 if args.frozen_dtype == "bf16" else None
    dit = WanDiT(cfg)
    vae = WanVAE(VAEConfig(dtype=fdt or jnp.float32))


    from more4d_tpu.utils import cast_float_leaves

    params = load_wan_dit(args.pretrained_ckpt, cfg)
    vae_params = cast_float_leaves(load_wan_vae(args.vae_ckpt), fdt)
    enc = VAEEncoderAdaptor()
    enc_params, _ = load_adaptor(args.encoder_adaptor, decoder=False)

    encoders = build_encoders(
        t5_ckpt=args.t5_ckpt, tokenizer_path=args.tokenizer,
        clip_ckpt=args.clip_ckpt, omnimae_ckpt=args.omnimae_ckpt,
        text_dim=cfg.text_dim, text_len=cfg.text_len,
        allow_dummy_text=args.allow_dummy_text, weight_dtype=fdt)

    mesh = create_mesh(parse_mesh_spec(args.mesh))
    tcfg = StraagTrainConfig(learning_rate=args.learning_rate,
                             max_grad_norm=args.max_grad_norm,
                             motion_sub_loss=args.motion_sub_loss,
                             world_size=(mesh.shape.get("dcn", 1)
                                         * mesh.shape["data"]),
                             grad_accum_steps=args.grad_accum_steps,
                             use_ema=args.use_ema,
                             ema_decay=args.ema_decay,
                             num_train_timesteps=args.train_sampling_steps,
                             uniform_sampling=args.uniform_sampling,
                             weighting_scheme=args.weighting_scheme,
                             logit_mean=args.logit_mean,
                             logit_std=args.logit_std,
                             mode_scale=args.mode_scale)
    rcfg = StraagRunConfig(
        output_dir=args.output_dir, batch_size=args.batch_size,
        max_steps=args.max_steps,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        validation_steps=args.validation_steps,
        control_dropout=args.control_dropout,
        text_dropout=args.text_dropout, seed=args.seed,
        resume=args.resume)

    validation_pipeline = None
    if args.validation_steps:
        pcfg = PipelineConfig(num_frames=args.num_frames,
                              height=args.height, width=args.width,
                              num_inference_steps=20)
        validation_pipeline = WanControlPipeline(dit, vae, pcfg)

    from more4d_tpu.train.optim import (make_adamw, make_lr_schedule,
                                        with_low_lr)

    # the schedule advances once per OPTIMIZER step: under --grad_accum_steps
    # the MultiSteps wrap (train/harness.py) steps it every k-th micro-step,
    # so total_steps must be optimizer steps, not the micro-step cap
    lr = make_lr_schedule(
        args.learning_rate, args.lr_scheduler, args.lr_warmup_steps,
        max(args.max_steps // max(args.grad_accum_steps, 1), 1))
    if args.optimizer == "came":
        from more4d_tpu.train import came

        if args.low_lr_names:
            # two-tier LR applies to CAME too (reference --use_came with
            # param groups, train_wan.py:1128-1142)
            tx = with_low_lr(came, lr, args.low_lr_names,
                             args.low_lr_ratio, params)
        else:
            tx = came(lr)
    else:
        tx = make_adamw(lr, low_lr_names=args.low_lr_names or None,
                        low_lr_ratio=args.low_lr_ratio,
                        betas=(args.adam_beta1, args.adam_beta2),
                        weight_decay=args.adam_weight_decay,
                        eps=args.adam_epsilon, params=params)

    trainable_filter = None
    if args.trainable_modules:
        names = [n.strip() for n in args.trainable_modules.split(",")
                 if n.strip()]
        trainable_filter = lambda path: any(n in path for n in names)  # noqa: E731

    trainer = StraagTrainer(
        dit, params, vae, vae_params, enc, enc_params,
        encode_text=encoders.encode_text, mesh=mesh, tcfg=tcfg,
        run_cfg=rcfg, encode_clip=encoders.encode_clip,
        extract_mpm=encoders.extract_mpm, tx=tx,
        validation_pipeline=validation_pipeline,
        trainable_filter=trainable_filter,
        report_grad_norms=args.report_model_info,
        split_step=args.split_step)

    files = sorted(glob.glob(os.path.join(args.data_dir,
                                          "*_dt3d_pred.pkl")))
    if not files:
        raise SystemExit(f"no *_dt3d_pred.pkl files in {args.data_dir}")
    if args.max_samples:
        files = files[:args.max_samples]
    prompts = {}
    if args.prompts_json:
        with open(args.prompts_json) as f:
            prompts = json.load(f)

    buckets = None
    if args.buckets:
        buckets = [tuple(int(v) for v in b.split("x"))
                   for b in args.buckets.split(",")]
    sampler = ResumableSampler(len(files), seed=args.seed)
    batches = make_batch_iterator(files, prompts, iter(sampler),
                                  args.batch_size, args.height, args.width,
                                  args.num_frames, buckets=buckets,
                                  skip_large_depth=args.skip_large_depth)
    from more4d_tpu.data.prefetch import prefetch

    trainer.train(prefetch(batches, depth=2, num_workers=2),
                  extra_state=sampler.state_dict,
                  restore_state=sampler.load_state_dict)


if __name__ == "__main__":
    main()

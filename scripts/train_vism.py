#!/usr/bin/env python
"""4D-ViSM LoRA training CLI (the TPU equivalent of
scripts/4D_ViSM_training/train.py).

Per step: ViSM training pair (projected/pre-rendered novel view + holes,
data/vism.py) -> frozen-VAE latents of original + masked video -> folded 4ch
mask latents (inpaint pipeline semantics, train.py:1634-1651) -> inpaint
conditioning zeroed by the t2v_flag (:1600-1605) -> jitted LoRA-only
flow-matching step (rank 4, lr 1e-4) -> LoRA-only safetensors-style orbax
checkpoints (:900-947) + metrics.
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
                   help="dir with videos/*.mp4 + dt3d_render/ pairs "
                        "(wan_dataset.py path conventions)")
    p.add_argument("--prompts_json", default=None)
    p.add_argument("--pretrained_ckpt", required=True,
                   help="Wan-Fun-InP base checkpoint")
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--t5_ckpt", default=None)
    p.add_argument("--allow_dummy_text", action="store_true",
                   help="permit training without --t5_ckpt (zero text "
                        "embeddings; smoke runs only)")
    p.add_argument("--frozen_dtype", default="bf16",
                   choices=["bf16", "fp32"],
                   help="storage dtype for the FROZEN towers (VAE/T5/CLIP) "
                        "- reference loads them at weight_dtype bf16 "
                        "(4D_ViSM_training/train.py mixed_precision)")
    p.add_argument("--tokenizer", default="google/umt5-xxl")
    p.add_argument("--clip_ckpt", default=None)
    p.add_argument("--use_3dgs", action="store_true",
                   help="use pre-rendered *_dt3d_render.mp4 instead of live "
                        "point projection")
    p.add_argument("--output_dir", default="vism_lora_ckpt")
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="micro-batch gradient accumulation (reference "
                        "--gradient_accumulation_steps)")
    p.add_argument("--lora_alpha", type=float, default=4.0)
    p.add_argument("--lora_skip_name", default=None,
                   help="skip LoRA on kernels whose path contains this "
                        "substring (reference --lora_skip_name)")
    p.add_argument("--export_kohya", action="store_true",
                   help="also write lora_kohya.safetensors at each "
                        "checkpoint — the reference merge_lora format "
                        "(lora_utils.py:368), so LoRA trained here loads "
                        "in the torch ecosystem")
    p.add_argument("--train_text_encoder", action="store_true",
                   help="also LoRA-train the umT5 text encoder (reference "
                        "network.apply_to(text_encoder, ..., True), "
                        "4D_ViSM_training/train.py:868); requires "
                        "--t5_ckpt")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="LoRA-gradient global-norm clip (reference "
                        "--max_grad_norm default 1.0)")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "came"],
                   help="came = the reference's --use_came")
    p.add_argument("--motion_sub_loss", action="store_true",
                   help="temporal-difference loss term (reference "
                        "--motion_sub_loss, train.py:1775-1779)")
    p.add_argument("--motion_sub_loss_ratio", type=float, default=0.25)
    p.add_argument("--uniform_sampling",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="--no-uniform_sampling switches to the SD3 "
                        "density sampler under --weighting_scheme "
                        "(train.py:1706-1712)")
    p.add_argument("--weighting_scheme", default="none",
                   choices=["sigma_sqrt", "logit_normal", "mode",
                            "cosmap", "none"])
    p.add_argument("--logit_mean", type=float, default=0.0)
    p.add_argument("--logit_std", type=float, default=1.0)
    p.add_argument("--mode_scale", type=float, default=1.29)
    # reference ViSM train.sh:30-31 Adam hyperparams + optional schedule
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--adam_weight_decay", type=float, default=3e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-10)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    # selective activation checkpointing (see train_straag --remat_policy);
    # LoRA training's backward is dominated by the frozen-base recompute,
    # so the flash/offload policies apply here too
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots", "flash", "flash_lite",
                            "flash_ffn", "flash_offload",
                            "flash_lite_offload", "flash_ffn_offload"])
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--log_steps", type=int, default=20)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_size", default="14b", choices=["14b", "1.3b"])
    p.add_argument("--offload_blocks", action="store_true",
                   help="stream the frozen base's block weights fp8 from "
                        "pinned host memory for fwd AND bwd (the only way "
                        "a 14B base trains on one 16 GiB chip; "
                        "train/lora_streamed.py). LoRA factors stay "
                        "HBM-resident.")
    p.add_argument("--resume", action="store_true")
    return p.parse_args()


def prepare_vism_batch(sample, vae, vae_params, encode_text, encode_clip,
                       encode_fn=None, tokenize=None):
    """ViSMSample -> jitted-step batch (train.py:1614-1668 semantics).

    With ``tokenize`` (--train_text_encoder) the batch carries raw
    input_ids/attention_mask and the step encodes text inside the loss."""
    import jax.numpy as jnp

    from more4d_tpu.models.vae_streaming import encode_streamed
    from more4d_tpu.pipelines.inpaint import (fold_mask_to_latent_channels,
                                              resize_mask_to_latent)

    enc = encode_fn or (lambda v: encode_streamed(vae, vae_params, v)[0])
    pixel = jnp.asarray(sample.pixel_values)[None]
    latents = enc(pixel)
    mask_latents = enc(jnp.asarray(sample.mask_pixel_values)[None])
    mask1 = jnp.asarray(sample.mask[..., :1])[None]     # [1,T,H,W,1]
    mask4 = fold_mask_to_latent_channels(1.0 - mask1)
    mask4 = resize_mask_to_latent(mask4, latents.shape)
    y = jnp.concatenate([mask4, mask_latents], axis=-1)
    y = y * sample.t2v_keep_flag                         # t2v_flag
    batch = {"latents": latents, "y": y}
    if tokenize is not None:
        ids, mask = tokenize([sample.text])
        batch["input_ids"] = ids
        batch["attention_mask"] = mask
    else:
        batch["context"] = encode_text([sample.text]).astype(jnp.float32)
    if encode_clip is not None:
        batch["clip_fea"] = encode_clip(
            jnp.asarray(sample.clip_image01)[None] * 2.0 - 1.0)
    return batch


def load_vism_video(path, num_frames, size):
    """Original-clip frames with the reference's sampling: the same
    stride-2-beyond-budget rule + last-frame padding as the prerendered
    videos (wan_dataset.py:606-609 reuses _load_video_frames), so original
    frame i pairs with render frame i — a contiguous first-N read would
    misalign long clips."""
    from more4d_tpu.data.vism import pad_frames, sample_frame_indices
    from more4d_tpu.utils.artifacts import read_video_frames

    video = read_video_frames(path, size=size)
    return pad_frames(video[sample_frame_indices(video.shape[0],
                                                 num_frames)], num_frames)


def run_training(dit, base_params, vae, vae_params, encode_text,
                 sample_iter, args, encode_clip=None,
                 text_encoder=None, te_params=None, tokenize=None):
    """Core loop, callable from tests with tiny models.

    ``base_params`` may be passed as a single-element list ("box"): the
    tree is popped out so the caller's frame holds no reference and the
    ``del`` in the --offload_blocks branch actually frees the host-RAM
    copy (a bare positional tree stays alive in the caller for the whole
    run — 2x the 14B checkpoint size of resident RAM)."""
    import jax
    import optax

    if isinstance(base_params, list):
        base_params = base_params.pop()

    from more4d_tpu.train.checkpoint import CheckpointManager
    from more4d_tpu.train.lora import create_lora
    from more4d_tpu.train.train_vism import (VismTrainConfig,
                                             make_vism_train_step)
    from more4d_tpu.utils.metrics import MetricsLogger

    from more4d_tpu.train.optim import make_lr_schedule

    tcfg = VismTrainConfig(
        learning_rate=args.learning_rate,
        max_grad_norm=getattr(args, "max_grad_norm", 1.0),
        motion_sub_loss=getattr(args, "motion_sub_loss", False),
        motion_sub_loss_ratio=getattr(args, "motion_sub_loss_ratio", 0.25),
        uniform_sampling=getattr(args, "uniform_sampling", True),
        weighting_scheme=getattr(args, "weighting_scheme", "none"),
        logit_mean=getattr(args, "logit_mean", 0.0),
        logit_std=getattr(args, "logit_std", 1.0),
        mode_scale=getattr(args, "mode_scale", 1.29))
    # total_steps in OPTIMIZER steps (the MultiSteps wrap below advances
    # the schedule once per accumulated update, not per micro-step);
    # getattr defaults keep run_training callable with a minimal args
    # namespace (tests construct SimpleNamespace)
    schedule = make_lr_schedule(
        args.learning_rate, getattr(args, "lr_scheduler", "constant"),
        getattr(args, "lr_warmup_steps", 0),
        max(args.max_steps // max(getattr(args, "grad_accum_steps", 1), 1),
            1))
    if getattr(args, "optimizer", "adamw") == "came":
        # reference --use_came (4D_ViSM_training/train.py:983-999)
        from more4d_tpu.train.optim import came

        tx = came(schedule,
                  weight_decay=getattr(args, "adam_weight_decay", 3e-2))
    else:
        tx = optax.adamw(
            schedule,
            b1=getattr(args, "adam_beta1", 0.9),
            b2=getattr(args, "adam_beta2", 0.999),
            weight_decay=getattr(args, "adam_weight_decay", 3e-2),
            eps=getattr(args, "adam_epsilon", 1e-10))
    if getattr(args, "grad_accum_steps", 1) > 1:
        # reference --gradient_accumulation_steps: mean gradient applied
        # every k-th micro-step; works for the streamed 14B path too
        # (the wrap only touches the factor-sized optimizer state)
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accum_steps)
    train_te = (text_encoder is not None
                and getattr(args, "train_text_encoder", False))
    skip_name = getattr(args, "lora_skip_name", None)
    if getattr(args, "offload_blocks", False):
        if train_te:
            raise SystemExit("--train_text_encoder is incompatible with "
                             "--offload_blocks (the streamed trainer "
                             "recomputes only the DiT)")
        # 14B-on-one-chip path: frozen fp8 base streams from pinned host
        # for the forward AND the backward recompute; only the LoRA
        # factors (and optimizer state) live in HBM
        from more4d_tpu.train.lora_streamed import make_streamed_lora_trainer

        trainer, lora, opt_state = make_streamed_lora_trainer(
            dit, base_params, tx, jax.random.PRNGKey(args.seed),
            rank=args.lora_rank, alpha=args.lora_alpha, quantize="fp8",
            skip_name=skip_name,
            max_grad_norm=tcfg.max_grad_norm,
            mse_threshold=tcfg.mse_threshold, shift=tcfg.shift,
            uniform_sampling=tcfg.uniform_sampling,
            weighting_scheme=tcfg.weighting_scheme,
            logit_mean=tcfg.logit_mean, logit_std=tcfg.logit_std,
            mode_scale=tcfg.mode_scale,
            acts_on_host=False)
        del base_params  # free host RAM: blocks now live in pinned memory

        def step_fn(lora, opt_state, _base, batch, rng):
            return trainer.train_step(lora, opt_state, batch, rng)

        base_params = None
    elif train_te:
        # LoRA on the umT5 tower too (reference --train_text_encoder,
        # train.py:868): both factor trees train under one optimizer
        from more4d_tpu.train.train_vism import TE_LORA_TARGETS

        lora = {"dit": create_lora(base_params,
                                   jax.random.PRNGKey(args.seed),
                                   rank=args.lora_rank,
                                   alpha=args.lora_alpha,
                                   skip_name=skip_name),
                "te": create_lora(te_params,
                                  jax.random.PRNGKey(args.seed + 1),
                                  rank=args.lora_rank,
                                  alpha=args.lora_alpha,
                                  targets=TE_LORA_TARGETS,
                                  skip_name=skip_name)}
        base_params = {"dit": base_params, "te": te_params}
        opt_state = tx.init({"dit": lora["dit"]["factors"],
                             "te": lora["te"]["factors"]})
        step_fn = jax.jit(make_vism_train_step(dit, tx, tcfg,
                                               text_encoder=text_encoder))
    else:
        lora = create_lora(base_params, jax.random.PRNGKey(args.seed),
                           rank=args.lora_rank, alpha=args.lora_alpha,
                           skip_name=skip_name)
        opt_state = tx.init(lora["factors"])
        step_fn = jax.jit(make_vism_train_step(dit, tx, tcfg))

    os.makedirs(args.output_dir, exist_ok=True)
    metrics = MetricsLogger(args.output_dir)
    mgr = CheckpointManager(args.output_dir)
    key = jax.random.PRNGKey(args.seed)
    global_step = 0
    if args.resume and mgr.latest_step() is not None:
        out = mgr.restore(params_like=lora, opt_state_like=opt_state,
                          with_extra=True)
        lora, opt_state = out["params"], out["opt_state"]
        global_step = (out.get("extra") or {}).get("global_step", 0)

    for sample in sample_iter:
        if global_step >= args.max_steps:
            break
        batch = prepare_vism_batch(sample, vae, vae_params, encode_text,
                                   encode_clip,
                                   tokenize=tokenize if train_te else None)
        key, sub = jax.random.split(key)
        lora, opt_state, m = step_fn(lora, opt_state, base_params, batch,
                                     sub)
        global_step += 1
        if global_step % args.log_steps == 0 or global_step == 1:
            metrics.log(global_step, {k: float(v) for k, v in m.items()},
                        prefix="train")
            print(f"step {global_step}: loss={float(m['loss']):.4f}")
        if global_step % args.checkpointing_steps == 0:
            # LoRA-only checkpoint (reference saves only the network,
            # train.py:940-941)
            mgr.save(global_step, lora, opt_state=opt_state,
                     extra={"global_step": global_step})
            if getattr(args, "export_kohya", False):
                from more4d_tpu.convert.lora_torch import save_kohya_lora

                export = lora["dit"] if train_te else lora
                if train_te:
                    print("NOTE: --export_kohya writes the DiT factors; "
                          "text-encoder factors stay orbax-only")
                save_kohya_lora(os.path.join(args.output_dir,
                                             "lora_kohya.safetensors"),
                                export)
    metrics.close()
    mgr.close()
    return lora


def main():
    args = parse_args()
    import jax

    from more4d_tpu.config import VAEConfig, dit_14b, dit_1_3b
    from more4d_tpu.convert.dit_torch import load_wan_dit
    from more4d_tpu.convert.vae_torch import load_wan_vae
    from more4d_tpu.data.vism import load_prerendered, prepare_vism_sample
    from more4d_tpu.infer.encoders import build_encoders
    from more4d_tpu.models import WanDiT
    from more4d_tpu.models.wan_vae import WanVAE

    make_dit = dit_14b if args.model_size == "14b" else dit_1_3b
    cfg = make_dit(motion_guidance=False, in_dim=36, model_type="i2v",
                   remat=True, remat_policy=args.remat_policy)
    import jax.numpy as jnp

    from more4d_tpu.utils import cast_float_leaves

    fdt = jnp.bfloat16 if args.frozen_dtype == "bf16" else None
    dit = WanDiT(cfg)
    vae = WanVAE(VAEConfig(dtype=fdt or jnp.float32))
    base_params = load_wan_dit(args.pretrained_ckpt, cfg)
    vae_params = cast_float_leaves(load_wan_vae(args.vae_ckpt), fdt)
    text_encoder = te_params = tokenize = None
    if args.train_text_encoder:
        # the T5 tower moves inside the train step (LoRA-merged per step),
        # so build it raw here and skip the frozen encode_text closure
        if not args.t5_ckpt:
            raise SystemExit("--train_text_encoder requires --t5_ckpt")
        import torch
        from transformers import AutoTokenizer

        from more4d_tpu.config import T5Config
        from more4d_tpu.models.t5 import WanT5Encoder, convert_t5_state_dict

        t5cfg = T5Config()
        text_encoder = WanT5Encoder(t5cfg)
        # the BASE tower is frozen (only its LoRA factors train): store it
        # at --frozen_dtype like every other frozen tower — umT5-xxl fp32
        # would not fit a 16 GiB chip
        te_params = cast_float_leaves(convert_t5_state_dict(
            torch.load(args.t5_ckpt, map_location="cpu",
                       weights_only=True), t5cfg), fdt)
        tok = AutoTokenizer.from_pretrained(args.tokenizer)

        def tokenize(prompts):
            toks = tok(list(prompts), padding="max_length",
                       truncation=True, max_length=t5cfg.text_len,
                       add_special_tokens=True, return_tensors="np")
            return (jnp.asarray(toks["input_ids"]),
                    jnp.asarray(toks["attention_mask"], jnp.float32))

    encoders = build_encoders(
        t5_ckpt=None if args.train_text_encoder else args.t5_ckpt,
        tokenizer_path=args.tokenizer,
        clip_ckpt=args.clip_ckpt, text_dim=cfg.text_dim,
        text_len=cfg.text_len,
        allow_dummy_text=args.allow_dummy_text or args.train_text_encoder,
        weight_dtype=fdt)

    videos = sorted(glob.glob(os.path.join(args.data_dir, "videos",
                                           "*.mp4")))
    if not videos:
        raise SystemExit(f"no videos/*.mp4 under {args.data_dir}")
    prompts = {}
    if args.prompts_json:
        with open(args.prompts_json) as f:
            prompts = json.load(f)
    rng = np.random.RandomState(args.seed)

    def samples():
        import pickle

        while True:
            path = videos[int(rng.randint(len(videos)))]
            name = os.path.splitext(os.path.basename(path))[0]
            try:
                video = load_vism_video(path, args.num_frames,
                                        (args.height, args.width))
                if args.use_3dgs:
                    render, mask = load_prerendered(
                        path, args.num_frames, (args.height, args.width))
                    yield prepare_vism_sample(
                        video, prompts.get(name, ""), prerendered=render,
                        prerendered_mask=mask,
                        max_num_frames=args.num_frames, rng=rng)
                else:
                    pkl = path.replace("videos", "dt3d_render").replace(
                        ".mp4", "_dt3d_pred.pkl")
                    with open(pkl, "rb") as f:
                        data = pickle.load(f)
                    yield prepare_vism_sample(
                        video, prompts.get(name, ""),
                        coords=np.asarray(data["coords"], np.float32),
                        colors=np.asarray(data["colors"], np.float32),
                        max_num_frames=args.num_frames, rng=rng)
            except Exception as e:
                print(f"skipping {path}: {e}")

    from more4d_tpu.data.prefetch import prefetch

    # overlap pkl IO + native z-buffer projection with the TPU step;
    # base_params moves in boxed so this frame drops its reference and
    # the streamed path can free the host-RAM tree (see run_training)
    box = [base_params]
    del base_params
    run_training(dit, box, vae, vae_params, encoders.encode_text,
                 prefetch(samples(), depth=4, num_workers=2), args,
                 encode_clip=encoders.encode_clip,
                 text_encoder=text_encoder, te_params=te_params,
                 tokenize=tokenize)


if __name__ == "__main__":
    main()

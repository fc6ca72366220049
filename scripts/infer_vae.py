#!/usr/bin/env python
"""VAE trajectory-adaptor roundtrip evaluation CLI (the TPU equivalent of
scripts/inference/infer_vae.py:57-199).

For each sceneflow pkl: normalize coordinates -> encoder adaptor -> frozen
causal VAE encode/decode -> decoder adaptor -> reconstruction metrics (L1,
RMSE, per-point endpoint error), plus optional side-by-side projected
point-cloud videos of original vs reconstructed trajectories (the
reference's visual roundtrip check). Writes metrics JSONL + one summary
JSON line to stdout.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_list", required=True)
    p.add_argument("--posfix", default="")
    p.add_argument("--data_root", default=None)
    p.add_argument("--vae_ckpt", required=True)
    p.add_argument("--encoder_adaptor", required=True)
    p.add_argument("--decoder_adaptor", required=True)
    p.add_argument("--output_dir", default="vae_eval")
    p.add_argument("--normalize", default="track_z",
                   choices=["track", "track_first_frame", "track_z",
                            "delta"])
    p.add_argument("--num_frames", type=int, default=17)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--max_samples", type=int, default=16)
    p.add_argument("--save_videos", action="store_true")
    p.add_argument("--render_type", default="project",
                   choices=["project", "3dgs", "both"],
                   help="roundtrip-video renderer: z-buffer projection "
                        "and/or the Pallas 3DGS rasteriser (reference "
                        "--render_type, infer_vae.py)")
    p.add_argument("--gs_scale", type=float, default=1e-4,
                   help="isotropic gaussian scale for the 3dgs render "
                        "(reference sigma, infer.py:261)")
    return p.parse_args()


def roundtrip(vae, vae_params, enc, enc_params, dec, dec_params, flow):
    """flow [T,H,W,3] normalized -> reconstructed flow (deterministic:
    posterior mode, infer-time behaviour)."""
    import jax.numpy as jnp

    from more4d_tpu.models.wan_vae import WanVAE

    pseudo = enc.apply(enc_params, jnp.asarray(flow)[None]) * 2.0 - 1.0
    mu, _ = vae.apply(vae_params, pseudo, method=WanVAE.encode)
    recon = vae.apply(vae_params, mu, clip=False, method=WanVAE.decode)
    out = dec.apply(dec_params, recon)
    return np.asarray(out[0], np.float32)


def evaluate(vae, vae_params, enc, enc_params, dec, dec_params,
             samples, args, render_fn=None):
    """samples yields (name, flow [T,H,W,3]); returns summary dict."""
    from more4d_tpu.utils.metrics import MetricsLogger

    os.makedirs(args.output_dir, exist_ok=True)
    metrics = MetricsLogger(args.output_dir, name="vae_eval")
    l1s, rmses, epes = [], [], []
    for i, (name, flow) in enumerate(samples):
        if i >= args.max_samples:
            break
        recon = roundtrip(vae, vae_params, enc, enc_params, dec, dec_params,
                          flow)
        err = recon - flow
        l1 = float(np.abs(err).mean())
        rmse = float(np.sqrt((err ** 2).mean()))
        epe = float(np.linalg.norm(err, axis=-1).mean())
        l1s.append(l1)
        rmses.append(rmse)
        epes.append(epe)
        metrics.log(i, {"l1": l1, "rmse": rmse, "epe": epe}, prefix=name)
        if render_fn is not None:
            render_fn(name, flow, recon)
    metrics.close()
    summary = {"metric": "vae_adaptor_roundtrip_epe",
               "value": float(np.mean(epes)) if epes else float("nan"),
               "unit": "mean-EPE",
               "extra": {"l1": float(np.mean(l1s)) if l1s else None,
                         "rmse": float(np.mean(rmses)) if rmses else None,
                         "n": len(epes)}}
    print(json.dumps(summary))
    return summary



def build_render_fn(args):
    """Roundtrip-video renderer for --save_videos: z-buffer projection
    and/or the Pallas 3DGS rasteriser (reference --render_type/--gs_scale,
    infer_vae.py:33-34,57-199)."""
    import jax.numpy as _jnp

    from more4d_tpu.data.vism import project_point_cloud
    from more4d_tpu.geometry import get_intrinsic_matrix
    from more4d_tpu.kernels.gs_splat import gs_render_tiled_video
    from more4d_tpu.utils.artifacts import save_videos_grid

    rh, rw = args.height // 2, args.width // 2
    render_type = getattr(args, "render_type", "project")
    gs_scale = getattr(args, "gs_scale", 1e-4)

    def _project_pair(flow, recon, colors):
        frames = []
        for t in range(flow.shape[0]):
            a, _ = project_point_cloud(
                flow[t].reshape(-1, 3) + np.array([0, 0, 2], np.float32),
                colors, rh, rw)
            b, _ = project_point_cloud(
                recon[t].reshape(-1, 3) + np.array([0, 0, 2], np.float32),
                colors, rh, rw)
            frames.append(np.concatenate([a, b], axis=1))
        return np.asarray(frames)

    def _gs_pair(flow, recon, colors):
        # Pallas tile rasteriser (the reference's 3DGS render_type)
        intr = _jnp.asarray(get_intrinsic_matrix(rh, rw), _jnp.float32)
        exts = _jnp.tile(_jnp.eye(4, dtype=_jnp.float32),
                         (flow.shape[0], 1, 1))
        off = np.array([0, 0, 2], np.float32)
        cj = _jnp.asarray(colors)
        a, _ = gs_render_tiled_video(
            _jnp.asarray(flow.reshape(flow.shape[0], -1, 3) + off),
            cj, exts, intr, rh, rw, scale=gs_scale)
        b, _ = gs_render_tiled_video(
            _jnp.asarray(recon.reshape(recon.shape[0], -1, 3) + off),
            cj, exts, intr, rh, rw, scale=gs_scale)
        return np.concatenate([np.asarray(a), np.asarray(b)], axis=2)

    def render_fn(name, flow, recon):
        rs = np.random.RandomState(0)
        colors = rs.rand(flow.shape[1] * flow.shape[2],
                         3).astype(np.float32)
        if render_type in ("project", "both"):
            save_videos_grid(
                os.path.join(args.output_dir, f"{name}_roundtrip.mp4"),
                _project_pair(flow, recon, colors)[None], fps=8)
        if render_type in ("3dgs", "both"):
            save_videos_grid(
                os.path.join(args.output_dir, f"{name}_roundtrip_gs.mp4"),
                np.clip(_gs_pair(flow, recon, colors), 0, 1)[None], fps=8)

    return render_fn


def main():
    args = parse_args()
    import jax.numpy as jnp

    from more4d_tpu.config import VAEConfig
    from more4d_tpu.convert.vae_torch import load_wan_vae
    from more4d_tpu.data.vae_flow import (VAEFlowDataset,
                                          normalize_vae_target)
    from more4d_tpu.models.adaptors import (VAEDecoderAdaptor,
                                            VAEEncoderAdaptor,
                                            load_adaptor)
    from more4d_tpu.models.wan_vae import WanVAE

    vae = WanVAE(VAEConfig())
    vae_params = load_wan_vae(args.vae_ckpt)
    enc, dec = VAEEncoderAdaptor(), VAEDecoderAdaptor()
    enc_params, _ = load_adaptor(args.encoder_adaptor, decoder=False)
    dec_params, vae_ft = load_adaptor(args.decoder_adaptor, decoder=True)
    if vae_ft is not None:
        # fine-tuned VAE decoder from train_vae.py --finetune_vae_decoder
        vae_params = {"params": {**vae_params["params"],
                                 "decoder": vae_ft["decoder"],
                                 "conv2": vae_ft["conv2"]}}

    ds = VAEFlowDataset(args.video_list, args.posfix, args.data_root,
                        args.height, args.width, args.num_frames)

    def samples():
        for i in range(len(ds)):
            try:
                s = ds[i]
            except Exception as e:
                print(f"skipping {ds.paths[i]}: {e}")
                continue
            name = os.path.splitext(os.path.basename(ds.paths[i]))[0]
            yield name, normalize_vae_target(s, args.normalize,
                                             args.num_frames, args.height,
                                             args.width)

    render_fn = build_render_fn(args) if args.save_videos else None

    evaluate(vae, vae_params, enc, enc_params, dec, dec_params, samples(),
             args, render_fn)


if __name__ == "__main__":
    main()

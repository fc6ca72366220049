#!/usr/bin/env python
"""First-contact validation for a released UniDepth checkpoint.

The reference's stage-1 entry point is the released UniDepthV2old
checkpoint (reference scripts/inference/infer.py:47,515-520); our JAX port's
decoder key table was written against a torch mirror because that
checkpoint is unfetchable in the build environment.  This subcommand runs
the strict loader's structural verification — key-manifest diff (missing /
unmapped keys) + shape agreement against the model graph — WITHOUT running
the model, so the first networked user can validate (or pinpoint the
renames for) a real checkpoint file in seconds instead of debugging a
silently mis-initialized depth head.

  python scripts/check_unidepth.py /path/to/unidepth_v2_vitl14.bin

Exit code 0 and "OK" means every decoder/backbone key mapped and every
converted leaf matches the model graph's shape; otherwise the complete
structured diff prints (each line is either a rename to add to
convert_unidepth_state_dict or an architecture gap to close).

--run_compare extends first contact to NUMERICS (VERDICT r4 #7): after
the strict load it runs the full JAX model on a test image AND the torch
oracle fed the SAME real weights (transformers.Dinov2Model for the
backbone + models/unidepth_mirror.py for the decoder), then compares the
depth map and intrinsics.  One command takes a real released checkpoint
from "file on disk" to "verified depth parity" (or a readable diagnosis).
If the encoder keys don't fit the transformers oracle, it degrades to a
decoder-only compare (the backbone stays covered by its key-level strict
check) and says so.  --image feeds a real photo instead of the default
deterministic 518x518 synthetic (native pos-embed grid: the compare then
exercises no pos-embed interpolation, whose bicubic kernels differ
between torch and jax.image).

Accepts .pth/.bin (torch.load, weights_only) and .safetensors.  Model
geometry knobs mirror UniDepthV2's constructor; pass them if the released
config differs from the ViT-L/14 defaults.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "module"):
        if isinstance(obj, dict) and key in obj and \
                isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise SystemExit(f"{path}: not a state dict (got {type(obj)})")
    return obj


def run_compare(sd, params, model, args):
    """Numerical first contact: full JAX graph vs the torch oracle on the
    SAME weights.  Returns 0 on parity within --tol, 1 otherwise."""
    import numpy as np
    import torch

    import jax.numpy as jnp
    from more4d_tpu.models.unidepth import UniDepthV2, preprocess
    from more4d_tpu.models.unidepth_mirror import torch_decoder_mirror

    norm_sd = {(k[len("pixel_decoder."):]
                if k.startswith("pixel_decoder.") else k): v
               for k, v in sd.items()}
    dec_sd = {k: torch.as_tensor(np.asarray(v)) for k, v in norm_sd.items()
              if not k.startswith("pixel_encoder.")}
    mirror = torch_decoder_mirror(
        dim=model.hidden_dim, backbone_dim=model.backbone_dim,
        n_adapt=args.num_adapters, cam_blocks=args.camera_blocks,
        depth_blocks=args.depth_blocks).eval()
    mirror.load_state_dict(dec_sd, strict=True)

    # torch backbone oracle: transformers' Dinov2Model on the same enc keys
    enc_sd = {k[len("pixel_encoder."):]: torch.as_tensor(np.asarray(v))
              for k, v in norm_sd.items() if k.startswith("pixel_encoder.")}
    enc_model = None
    if enc_sd:
        try:
            from transformers import Dinov2Config, Dinov2Model

            pos = enc_sd["embeddings.position_embeddings"]
            grid = int(round((pos.shape[1] - 1) ** 0.5))
            cfg = Dinov2Config(
                hidden_size=model.backbone_dim,
                num_hidden_layers=model.backbone_depth,
                num_attention_heads=model.backbone_heads,
                intermediate_size=int(
                    enc_sd["encoder.layer.0.mlp.fc1.weight"].shape[0]),
                image_size=grid * 14, patch_size=14, layerscale_value=1.0)
            enc_model = Dinov2Model(cfg).eval()
            missing, unexpected = enc_model.load_state_dict(enc_sd,
                                                            strict=False)
            unexpected = [k for k in unexpected if "mask_token" not in k]
            if missing or unexpected:
                raise ValueError(f"missing={missing[:4]} "
                                 f"unexpected={unexpected[:4]}")
        except Exception as e:
            print(f"NOTE: encoder keys do not fit the transformers "
                  f"Dinov2Model oracle ({type(e).__name__}: {str(e)[:200]});"
                  f" degrading to the decoder-only compare (the backbone "
                  f"stays covered by the strict key/shape check above).")
            enc_model = None

    if enc_model is not None:
        # full-graph compare on one image.  Default: deterministic
        # synthetic at the NATIVE 518x518 pos-embed grid (37x37 patches),
        # so no pos interpolation is exercised — torch's and jax.image's
        # bicubic kernels differ (A=-0.75 vs -0.5) and would add noise
        # that has nothing to do with the checkpoint.
        if args.image:
            import imageio.v2 as imageio

            img01 = np.asarray(imageio.imread(args.image),
                               np.float32)[..., :3] / 255.0
        else:
            img01 = np.random.RandomState(0).rand(518, 518, 3) \
                .astype(np.float32)
        x, _hw = preprocess(img01)
        nh, nw = x.shape[1], x.shape[2]
        gh, gw = nh // 14, nw // 14
        depth_j, k_j = model.apply(params, x)
        with torch.no_grad():
            xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
            hs = enc_model(xt, output_hidden_states=True).hidden_states
            levels = [enc_model.layernorm(hs[i + 1])[:, 1:, :]
                      for i in model.layer_ids]
            depth_t, k_t = mirror(levels, nh, nw, gh, gw)
        scope = f"FULL GRAPH (encoder+decoder), {nh}x{nw} input"
    else:
        # decoder-only: identical synthetic tap features through both
        gh, gw = 37, 37
        nh, nw = gh * 14, gw * 14
        rs = np.random.RandomState(0)
        levels_np = [rs.randn(1, gh * gw, model.backbone_dim)
                     .astype(np.float32) * 0.5
                     for _ in range(len(model.layer_ids))]
        depth_j, k_j = model.apply(
            params, [(jnp.asarray(l), None) for l in levels_np],
            nh, nw, (gh, gw), method=UniDepthV2.decode)
        with torch.no_grad():
            depth_t, k_t = mirror([torch.from_numpy(l) for l in levels_np],
                                  nh, nw, gh, gw)
        scope = "DECODER ONLY (synthetic tap features)"

    dj = np.asarray(depth_j, np.float64)
    dt = depth_t.numpy().astype(np.float64)
    rel = np.abs(dj - dt) / np.maximum(np.abs(dt), 1e-6)
    k_rel = np.abs(np.asarray(k_j, np.float64) - k_t.numpy()) \
        / np.maximum(np.abs(k_t.numpy()), 1e-6)
    print(f"compare [{scope}]:")
    print(f"  depth: jax range [{dj.min():.4f}, {dj.max():.4f}]  "
          f"torch range [{dt.min():.4f}, {dt.max():.4f}]")
    print(f"  depth rel err: max {rel.max():.3e}  mean {rel.mean():.3e}")
    print(f"  K (intrinsics) rel err: max {k_rel.max():.3e}")
    ok = rel.max() < args.tol and k_rel.max() < args.tol
    if ok:
        print(f"COMPARE OK: JAX port matches the torch oracle on the real "
              f"weights within tol={args.tol}.")
        return 0
    print(f"COMPARE FAILED: divergence exceeds tol={args.tol}. The key "
          f"mapping is structurally sound (strict load passed), so suspect "
          f"a semantic gap — activation/normalization/interp details. "
          f"Bisect with tests/test_unidepth.py's per-head goldens.")
    return 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint")
    p.add_argument("--num_adapters", type=int, default=4)
    p.add_argument("--camera_blocks", type=int, default=2)
    p.add_argument("--depth_blocks", type=int, default=4)
    p.add_argument("--run_compare", action="store_true",
                   help="after the strict load, run the JAX model AND the "
                        "torch oracle (Dinov2Model + decoder mirror) on "
                        "the same weights and compare the depth map")
    p.add_argument("--image", default=None,
                   help="image file for --run_compare (default: "
                        "deterministic synthetic at the native 518x518)")
    p.add_argument("--tol", type=float, default=1e-2,
                   help="max relative error for --run_compare to pass")
    # model-graph geometry (UniDepthV2 constructor; defaults = ViT-L/14)
    p.add_argument("--backbone_dim", type=int, default=None)
    p.add_argument("--backbone_depth", type=int, default=None)
    p.add_argument("--backbone_heads", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    p.add_argument("--layer_ids", default=None,
                   help="comma-separated backbone tap layers")
    p.add_argument("--strip_prefix", default=None,
                   help="strip this prefix from every checkpoint key "
                        "first (e.g. 'model.')")
    args = p.parse_args(argv)

    import jax

    if jax.default_backend() not in ("cpu",):
        # shape-only validation — no accelerator needed, and first TPU
        # contact costs a minute of tunnel warmup
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from more4d_tpu.models.unidepth import UniDepthV2, load_unidepth_strict

    model_kw = {k: getattr(args, k) for k in
                ("backbone_dim", "backbone_depth", "backbone_heads",
                 "hidden_dim") if getattr(args, k) is not None}
    if args.layer_ids:
        model_kw["layer_ids"] = tuple(
            int(t) for t in args.layer_ids.split(","))
    model = UniDepthV2(**model_kw)

    sd = load_state_dict(args.checkpoint)
    if args.strip_prefix:
        sd = {(k[len(args.strip_prefix):]
               if k.startswith(args.strip_prefix) else k): v
              for k, v in sd.items()}
    n_enc = sum(k.startswith("pixel_encoder.") for k in sd)
    print(f"{args.checkpoint}: {len(sd)} keys "
          f"({n_enc} pixel_encoder.*, {len(sd) - n_enc} decoder)")
    try:
        params = load_unidepth_strict(sd, model,
                                      num_adapters=args.num_adapters,
                                      camera_blocks=args.camera_blocks,
                                      depth_blocks=args.depth_blocks)
    except ValueError as e:
        print(str(e))
        print("\nFAILED: fix the renames/gaps above in "
              "more4d_tpu/models/unidepth.py::convert_unidepth_state_dict "
              "(or pass --strip_prefix / geometry flags), then re-run.")
        return 1
    print("OK: every key mapped; every converted leaf matches the model "
          "graph. --depth_provider unidepth_jax is safe to use with this "
          "file.")
    if args.run_compare:
        return run_compare(sd, params, model, args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint")
    p.add_argument("--num_adapters", type=int, default=4)
    p.add_argument("--camera_blocks", type=int, default=2)
    p.add_argument("--depth_blocks", type=int, default=4)
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
    model = UniDepthV2(**model_kw) if model_kw else None

    sd = load_state_dict(args.checkpoint)
    if args.strip_prefix:
        sd = {(k[len(args.strip_prefix):]
               if k.startswith(args.strip_prefix) else k): v
              for k, v in sd.items()}
    n_enc = sum(k.startswith("pixel_encoder.") for k in sd)
    print(f"{args.checkpoint}: {len(sd)} keys "
          f"({n_enc} pixel_encoder.*, {len(sd) - n_enc} decoder)")
    try:
        load_unidepth_strict(sd, model, num_adapters=args.num_adapters,
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

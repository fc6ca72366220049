"""Golden: kohya-LoRA converter + apply_lora vs the reference merge_lora.

The reference ships ViSM LoRA weights in kohya naming and merges them into
the transformer with ``merge_lora`` (MoRe4D/utils/lora_utils.py:368:
``W += multiplier * (alpha/rank) * up @ down`` resolved by fuzzy
attribute-walking the module tree).  Here the REAL reference function runs
on a tiny torch DiT, and the result must equal loading the same state dict
through ``convert_kohya_lora`` + ``apply_lora`` on the converted flax
params — validating naming, transposes, the alpha/rank scale, and the
scanned-stack layout in one equation.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
from _ref_loader import load_reference_dit, load_reference_module  # noqa: E402

from more4d_tpu.config import dit_tiny  # noqa: E402
from more4d_tpu.convert.dit_torch import convert_dit_state_dict  # noqa: E402
from more4d_tpu.convert.lora_torch import convert_kohya_lora  # noqa: E402
from more4d_tpu.train.lora import apply_lora  # noqa: E402


def _load_ref_lora_utils():
    # lora_utils imports diffusers.models.lora + transformers.T5EncoderModel;
    # extend the _ref_loader diffusers stub with the lora submodule
    import diffusers

    lora_sub = types.ModuleType("diffusers.models.lora")

    class LoRACompatibleConv:  # imported but unused by merge_lora
        pass

    class LoRACompatibleLinear:
        pass

    lora_sub.LoRACompatibleConv = LoRACompatibleConv
    lora_sub.LoRACompatibleLinear = LoRACompatibleLinear
    sys.modules["diffusers.models.lora"] = lora_sub
    diffusers.models.lora = lora_sub
    return load_reference_module("MoRe4D/utils/lora_utils.py",
                                 "ref_lora_utils")


@pytest.mark.parametrize("scan_blocks", [True, False])
def test_kohya_lora_merge_matches_reference(scan_blocks):
    dit_mod = load_reference_dit("wan_transformer4d")
    lora_mod = _load_ref_lora_utils()

    tcfg = dit_tiny(in_dim=16, out_dim=16, model_type="t2v",
                    motion_guidance=False, scan_blocks=scan_blocks,
                    dtype=np.float32, param_dtype=np.float32)
    torch.manual_seed(0)
    ref = dit_mod.WanTransformer4DModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=tcfg.text_len,
        in_dim=16, dim=tcfg.dim, ffn_dim=tcfg.ffn_dim,
        freq_dim=tcfg.freq_dim, text_dim=tcfg.text_dim, out_dim=16,
        num_heads=tcfg.num_heads, num_layers=tcfg.num_layers,
        qk_norm=True, cross_attn_norm=True, use_dino_guidance=False,
        use_omnimae_guidance=False)
    sd_before = {k: v.clone() for k, v in ref.state_dict().items()}

    # synthesize a kohya LoRA over every linear the ViSM network targets
    # (lora_utils.py:158-160: attention q/k/v/o + both ffn linears)
    rank, alpha, mult = 4, 2.0, 0.55
    rs = np.random.RandomState(1)
    dims = {"self_attn_q": (tcfg.dim, tcfg.dim),
            "self_attn_k": (tcfg.dim, tcfg.dim),
            "self_attn_v": (tcfg.dim, tcfg.dim),
            "self_attn_o": (tcfg.dim, tcfg.dim),
            "cross_attn_q": (tcfg.dim, tcfg.dim),
            "cross_attn_k": (tcfg.dim, tcfg.dim),
            "cross_attn_v": (tcfg.dim, tcfg.dim),
            "cross_attn_o": (tcfg.dim, tcfg.dim),
            "ffn_0": (tcfg.ffn_dim, tcfg.dim),
            "ffn_2": (tcfg.dim, tcfg.ffn_dim)}
    lora_sd = {}
    for b in range(tcfg.num_layers):
        for mod_name, (out_f, in_f) in dims.items():
            base = f"lora_unet_blocks_{b}_{mod_name}"
            lora_sd[base + ".lora_down.weight"] = torch.tensor(
                rs.randn(rank, in_f).astype(np.float32) * 0.1)
            lora_sd[base + ".lora_up.weight"] = torch.tensor(
                rs.randn(out_f, rank).astype(np.float32) * 0.1)
            lora_sd[base + ".alpha"] = torch.tensor(float(alpha))

    # reference merge (the real function, fuzzy module walk and all)
    ref.device = torch.device("cpu")  # stub ModelMixin lacks .device
    pipeline = types.SimpleNamespace(transformer=ref)
    lora_mod.merge_lora(pipeline, None, mult, state_dict=dict(lora_sd))
    sd_merged = ref.state_dict()

    # every targeted weight must actually have moved (guards against the
    # fuzzy walker silently skipping layers: 'Error loading layer')
    for b in range(tcfg.num_layers):
        for tname in (f"blocks.{b}.self_attn.q.weight",
                      f"blocks.{b}.cross_attn.o.weight",
                      f"blocks.{b}.ffn.0.weight",
                      f"blocks.{b}.ffn.2.weight"):
            delta = (sd_merged[tname] - sd_before[tname]).abs().max()
            assert float(delta) > 1e-6, f"{tname} not merged by reference"

    # our path: convert base, convert LoRA, merge functionally
    params = convert_dit_state_dict(sd_before, tcfg)
    lora = convert_kohya_lora(lora_sd, tcfg)
    assert lora["rank"] == rank and lora["alpha"] == alpha
    assert len(lora["factors"]) == (len(dims) if scan_blocks
                                    else len(dims) * tcfg.num_layers)
    ours = apply_lora(params, lora, multiplier=mult)

    theirs = convert_dit_state_dict(sd_merged, tcfg)
    flat_a = jax_flat(ours)
    flat_b = jax_flat(theirs)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k], np.float32),
            np.asarray(flat_b[k], np.float32), atol=1e-5,
            err_msg=k)


@pytest.mark.parametrize("scan_blocks", [True, False])
def test_kohya_export_roundtrip(scan_blocks):
    """export_kohya_lora is the exact inverse of convert_kohya_lora, in
    both scanned and per-block layouts — LoRA trained here ships back to
    the reference's merge_lora format losslessly."""
    import jax
    import jax.numpy as jnp

    from more4d_tpu.convert.lora_torch import (convert_kohya_lora,
                                               export_kohya_lora)
    from more4d_tpu.models import WanDiT
    from more4d_tpu.train.lora import create_lora

    tcfg = dit_tiny(in_dim=16, out_dim=16, model_type="t2v",
                    motion_guidance=False, scan_blocks=scan_blocks,
                    dtype=np.float32, param_dtype=np.float32)
    dit = WanDiT(tcfg)
    params = dit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 4, 4, 16), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1, 4, tcfg.text_dim), jnp.float32))
    lora = create_lora(params, jax.random.PRNGKey(1), rank=3, alpha=2.0)
    # randomize up too (zero-init would hide transpose errors)
    rs = np.random.RandomState(2)
    lora["factors"] = {
        k: {"down": np.asarray(rs.randn(*np.shape(f["down"])), np.float32),
            "up": np.asarray(rs.randn(*np.shape(f["up"])), np.float32)}
        for k, f in lora["factors"].items()}

    sd = export_kohya_lora(lora)
    assert all(k.startswith("lora_unet_blocks_") for k in sd)
    back = convert_kohya_lora(sd, tcfg)
    assert back["rank"] == 3 and back["alpha"] == 2.0
    assert back["factors"].keys() == lora["factors"].keys()
    for k in lora["factors"]:
        for part in ("down", "up"):
            np.testing.assert_array_equal(
                np.asarray(back["factors"][k][part]),
                np.asarray(lora["factors"][k][part]), err_msg=f"{k}/{part}")


def jax_flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flat(v, f"{prefix}/{k}" if prefix else k))
        return out
    out[prefix] = tree
    return out

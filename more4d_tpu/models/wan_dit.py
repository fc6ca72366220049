"""Wan2.1-Fun DiT backbone (3D) and 4D-STraG variant, TPU-native.

Re-implements the behaviour of the reference ``WanTransformer3DModel``
(MoRe4D/models/wan_transformer3d.py:723) and ``WanTransformer4DModel``
(MoRe4D/models/wan_transformer4d.py:785) as one flax module:

- 3-axis RoPE over the (t, h, w) latent grid, with RIFLEx frame extrapolation.
- adaLN conditioning with a per-block learned modulation table (6-way) and a
  2-way table in the output head (wan_transformer4d.py:624,706).
- i2v cross attention: 257 CLIP image tokens prepended to the text context and
  routed through separate k_img/v_img projections (:500-554).
- Motion Perception Module (4D variant): OmniMAE first-frame patch features,
  adapted by a small conv stack, bilinearly resized onto the latent grid, and
  injected into every block through zero-initialised FiLM (scale/shift gated
  per channel) before self-attention and before the FFN (:739-783, :1127-1158).
- optional ref_conv: a reference-image latent patchified by a 2D conv and
  prepended as an extra "frame 0" of tokens (:945-948, :1086-1090).

Layout is TPU-native channel-last: video latents are [B, T, H, W, C]; tokens
are [B, L, D]. The block stack runs under ``lax.scan`` with stacked parameters
(fast compile, natural FSDP sharding) and optional per-block rematerialisation.

TeaCache / cfg-skip are *pipeline* concerns here (functional denoise-loop
state); the model exposes ``embed`` / ``backbone`` / ``finalize`` so the
pipeline can wrap the block stack in ``lax.cond``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import DiTConfig
from .. import nn as mnn
from ..nn.layers import RMSNorm, LayerNormAffine, layer_norm, \
    sinusoidal_embedding
from ..nn.rope import RopeTables, rope_angles_3d, apply_rope
from ..nn.attention import attention

# ImageNet normalisation applied to the MPM first frame
# (wan_transformer4d.py:1134).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def zero_mpm_fallback(cfg, tokens, mpm, mask):
    """Zero MPM features + mask for a 4D (motion_guidance) model running
    without motion conditioning. The ONE copy of this shape/dtype
    convention — the resident backbone, the streamed inference walk
    (parallel/offload.py) and the streamed LoRA trainer
    (train/lora_streamed.py) must all agree or streamed-vs-resident
    outputs diverge."""
    if mpm is None and cfg.motion_guidance:
        mpm = jnp.zeros(tokens.shape[:2] + (cfg.motion_feature_dim,),
                        cfg.dtype)
        mask = jnp.zeros((tokens.shape[1], 1), jnp.float32)
    return mpm, mask


def xavier_uniform():
    return nn.initializers.xavier_uniform()


def remat_policy_of(cfg: DiTConfig):
    """Map cfg.remat_policy to a jax checkpoint policy (None = save
    nothing, recompute the whole block: ~4x-fwd executed FLOPs).

    'dots' saves every MXU output (max HBM). 'flash' saves the
    self-attention residuals — post-rope q/k/v (named in SelfAttention)
    plus the flash kernel's (o, lse) (named inside the custom-vjp fwd,
    kernels/flash_attention.py) — so the backward recompute walk skips the
    O(L^2) attention forward AND the qkv projections: ~3.3x-fwd executed
    for ~118 MiB/block extra HBM at the 1.3B 49f operating point.
    'flash_ffn' additionally saves the FFN hidden (fc1 out): cheapest
    recompute, +~170 MiB/block at 1.3B. All policies are numerically
    identical (test_wan_dit.py::test_remat_policies_numerically_identical);
    they trade recompute FLOPs for activation residency only."""
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    policy = cfg.remat_policy or ""
    offload = policy.endswith("_offload")
    base = policy[:-len("_offload")] if offload else policy
    if base in ("flash", "flash_lite", "flash_ffn"):
        # 'flash_lite' keeps only (o, lse) — the flash forward still never
        # re-runs (those ARE its remaining vjp residuals; q/k/v recompute
        # via the cheap qkv projection), at ~1/4 the saved bytes: the
        # right point on a 16 GiB chip where the full set OOMs beside the
        # optimizer state (measured: 'flash' at 1.3B/49f/bs1 + AdamW
        # exhausts HBM, 'flash_lite' fits).
        names = ["sa_o", "sa_lse"]
        if base in ("flash", "flash_ffn"):
            names = ["sa_q", "sa_k", "sa_v"] + names
        if base == "flash_ffn":
            names.append("ffn_hidden")
        if offload:
            # '<base>_offload': the saved residuals PARK IN PINNED HOST
            # MEMORY between forward and backward instead of HBM — same
            # recompute cut at ~zero HBM residency, for one D2H copy in
            # the forward and one H2D in the backward (XLA schedules both
            # async; measured pinned-host BW here is 6.6-13.4 GB/s, so
            # the 'flash' set's ~3.6 GiB rides under the ~1.5 s step).
            # This is what makes the flash policies usable at 1.3B+AdamW
            # on a 16 GiB chip, where the on-device saved set
            # RESOURCE_EXHAUSTs (round-4 measurement).
            return jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=names,
                offload_src="device", offload_dst="pinned_host")
        return jax.checkpoint_policies.save_only_these_names(*names)
    return None


class FeedForward(nn.Module):
    dim: int
    ffn_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.ffn_dim, kernel_init=xavier_uniform(),
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        # remat-policy hook: 'flash_ffn' additionally saves the [B, L, F]
        # hidden so fc1 is not re-run in the backward recompute walk
        # (memory-expensive: F=8960 at 1.3B — only for small seq budgets)
        x = checkpoint_name(x, "ffn_hidden")
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.dim, kernel_init=xavier_uniform(),
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(x)
        return x


class _ProjParams(nn.Module):
    """Kernel+bias holder with Dense-compatible tree layout, for the fused
    qkv path (the fused matmul needs the raw weights)."""

    in_dim: int
    out_dim: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", xavier_uniform(),
                          (self.in_dim, self.out_dim), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_dim,), self.param_dtype)
        return kern, bias


class SelfAttention(nn.Module):
    """WanSelfAttention (wan_transformer4d.py:409-466): full-width qk RMSNorm,
    3-axis RoPE, flash attention with kv-length masking."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, kv_lens):
        cfg = self.cfg
        d = cfg.head_dim
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.dim, kernel_init=xavier_uniform(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        b, l, _ = x.shape
        if cfg.fused_qkv:
            mk = lambda name: _ProjParams(  # noqa: E731
                cfg.dim, cfg.dim, cfg.param_dtype, name=name)()
            (wq, bq), (wk, bk), (wv, bv) = mk("q"), mk("k"), mk("v")
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(cfg.dtype)
            bias = jnp.concatenate([bq, bk, bv]).astype(cfg.dtype)
            qkv = jnp.dot(x.astype(cfg.dtype), w) + bias
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense("q")(x)
            k = dense("k")(x)
            v = dense("v")(x)
        if cfg.qk_norm:
            q = RMSNorm(cfg.dim, eps=cfg.eps, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm_q")(q)
            k = RMSNorm(cfg.dim, eps=cfg.eps, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm_k")(k)
        q = q.reshape(b, l, cfg.num_heads, d)
        k = k.reshape(b, l, cfg.num_heads, d)
        v = v.reshape(b, l, cfg.num_heads, d)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        # remat-policy residual names (remat_policy='flash'): with post-rope
        # q/k/v AND the kernel's (o, lse) residuals saved, the backward
        # recompute walk skips both the qkv projections and the O(L^2)
        # flash forward — only norms/FiLM/projection tails re-run.
        q = checkpoint_name(q, "sa_q")
        k = checkpoint_name(k, "sa_k")
        v = checkpoint_name(v, "sa_v")
        o = attention(q, k, v, kv_lens=kv_lens,
                      backend=cfg.attention_backend,
                      sequence_parallel=True, ckpt_name="sa")
        o = o.reshape(b, l, cfg.dim)
        return dense("o")(o)


class CrossAttention(nn.Module):
    """t2v/i2v cross attention (wan_transformer4d.py:469-554)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.cfg
        d = cfg.head_dim
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.dim, kernel_init=xavier_uniform(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        b, l, _ = x.shape
        q = dense("q")(x)
        if cfg.qk_norm:
            q = RMSNorm(cfg.dim, eps=cfg.eps, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm_q")(q)
        q = q.reshape(b, l, cfg.num_heads, d)

        if cfg.model_type == "i2v":
            ctx_img = context[:, :cfg.clip_tokens]
            ctx_txt = context[:, cfg.clip_tokens:]
        else:
            ctx_img, ctx_txt = None, context

        k = dense("k")(ctx_txt)
        if cfg.qk_norm:
            k = RMSNorm(cfg.dim, eps=cfg.eps, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="norm_k")(k)
        k = k.reshape(b, -1, cfg.num_heads, d)
        v = dense("v")(ctx_txt).reshape(b, -1, cfg.num_heads, d)
        o = attention(q, k, v, backend=cfg.attention_backend)

        if ctx_img is not None:
            k_img = dense("k_img")(ctx_img)
            if cfg.qk_norm:
                k_img = RMSNorm(cfg.dim, eps=cfg.eps, dtype=cfg.dtype,
                                param_dtype=cfg.param_dtype,
                                name="norm_k_img")(k_img)
            k_img = k_img.reshape(b, -1, cfg.num_heads, d)
            v_img = dense("v_img")(ctx_img).reshape(b, -1, cfg.num_heads, d)
            o = o + attention(q, k_img, v_img,
                              backend=cfg.attention_backend)

        o = o.reshape(b, l, cfg.dim)
        return dense("o")(o)


class SpatialGuidance(nn.Module):
    """Zero-initialised FiLM from MPM features (wan_transformer4d.py:739-783).

    ``mask`` ([L, 1] float, optional) marks tokens that have real features;
    beyond them scale/shift are zero — the reference zero-pads scale/shift
    *after* the linear (:772-776), so padded tokens must not receive the
    projection bias.
    """

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, features, mask=None):
        cfg = self.cfg
        h = nn.silu(features.astype(cfg.dtype))
        params = nn.Dense(2 * cfg.dim, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="spatial_guide")(h)
        if mask is not None:
            params = params * mask[None].astype(params.dtype)
        scale, shift = jnp.split(params, 2, axis=-1)
        gate = self.param("gate", nn.initializers.zeros, (cfg.dim,),
                          cfg.param_dtype).astype(cfg.dtype)
        return x * (1 + scale * gate) + shift * gate


class WanBlock(nn.Module):
    """One DiT block: adaLN, (FiLM), self-attn, cross-attn, (FiLM), FFN
    (WanAttentionBlock, wan_transformer4d.py:585-688)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, e0, context, rope_cos, rope_sin, kv_lens,
                 mpm_tokens, mpm_mask):
        cfg = self.cfg
        modulation = self.param(
            "modulation",
            nn.initializers.normal(stddev=cfg.dim ** -0.5),
            (1, 6, cfg.dim), cfg.param_dtype)

        # e0: [B, 6, D] (per-sample t) or [B, L, 6, D] (per-token t).
        ef = e0.astype(jnp.float32)
        if e0.ndim == 4:
            e = modulation[None].astype(jnp.float32) + ef    # [B, L, 6, D]
        else:
            e = modulation.astype(jnp.float32) + ef          # [B, 6, D]
            e = e[:, None]                                   # [B, 1, 6, D]
        shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = [
            e[..., i, :].astype(cfg.dtype) for i in range(6)]

        h = layer_norm(x, cfg.eps) * (1 + scale_sa) + shift_sa
        if cfg.motion_guidance:
            h = SpatialGuidance(cfg, name="spatial_guidance_self")(
                h, mpm_tokens, mpm_mask)
        y = SelfAttention(cfg, name="self_attn")(h, rope_cos, rope_sin,
                                                 kv_lens)
        x = x + y * gate_sa

        if cfg.cross_attn_norm:
            h = LayerNormAffine(cfg.dim, cfg.eps, dtype=cfg.dtype,
                                param_dtype=cfg.param_dtype, name="norm3")(x)
        else:
            h = x
        x = x + CrossAttention(cfg, name="cross_attn")(h, context)

        h = layer_norm(x, cfg.eps) * (1 + scale_ff) + shift_ff
        if cfg.motion_guidance:
            h = SpatialGuidance(cfg, name="spatial_guidance_ffn")(
                h, mpm_tokens, mpm_mask)
        y = FeedForward(cfg.dim, cfg.ffn_dim, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="ffn")(h)
        x = x + y * gate_ff
        return x


class _ScanBlock(nn.Module):
    """Scan-compatible wrapper: (carry, *broadcast) -> (carry, None)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, e0, context, rope_cos, rope_sin, kv_lens,
                 mpm_tokens, mpm_mask):
        x = WanBlock(self.cfg, name="block")(
            x, e0, context, rope_cos, rope_sin, kv_lens, mpm_tokens,
            mpm_mask)
        return x, None


class Head(nn.Module):
    """Output head with 2-way adaLN (wan_transformer4d.py:691-721)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, e):
        cfg = self.cfg
        out = math.prod(cfg.patch_size) * cfg.out_dim
        modulation = self.param(
            "modulation", nn.initializers.normal(stddev=cfg.dim ** -0.5),
            (1, 2, cfg.dim), cfg.param_dtype)
        ef = e.astype(jnp.float32)
        if e.ndim == 3:                                       # [B, L, D]
            m = modulation[None].astype(jnp.float32) + ef[:, :, None]
        else:                                                 # [B, D]
            m = modulation.astype(jnp.float32) + ef[:, None]  # [B, 2, D]
            m = m[:, None]                                    # [B, 1, 2, D]
        shift, scale = [m[..., i, :].astype(cfg.dtype) for i in range(2)]
        h = layer_norm(x, cfg.eps) * (1 + scale) + shift
        return nn.Dense(out, kernel_init=nn.initializers.zeros,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="head")(h)


@dataclasses.dataclass
class DiTIntermediates:
    """Carries embed-stage outputs into backbone/finalize (teacache support)."""

    tokens: jnp.ndarray           # [B, L, D]
    e: jnp.ndarray                # [B, D] or [B, L, D]
    e0: jnp.ndarray               # [B, 6, D] or [B, L, 6, D]
    context: jnp.ndarray          # [B, Lc, D]
    rope_cos: jnp.ndarray
    rope_sin: jnp.ndarray
    kv_lens: Optional[jnp.ndarray]
    mpm_tokens: Optional[jnp.ndarray]
    mpm_mask: Optional[jnp.ndarray]
    grid: Tuple[int, int, int]
    ref_tokens: int


jax.tree_util.register_dataclass(
    DiTIntermediates,
    data_fields=["tokens", "e", "e0", "context", "rope_cos", "rope_sin",
                 "kv_lens", "mpm_tokens", "mpm_mask"],
    meta_fields=["grid", "ref_tokens"])


class WanDiT(nn.Module):
    """The Wan video DiT. ``cfg.motion_guidance`` selects the 4D variant."""

    cfg: DiTConfig

    def setup(self):
        cfg = self.cfg
        self.patch_embedding = nn.Conv(
            cfg.dim, kernel_size=cfg.patch_size, strides=cfg.patch_size,
            padding="VALID", kernel_init=xavier_uniform(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype)
        self.text_fc1 = nn.Dense(cfg.dim,
                                 kernel_init=nn.initializers.normal(0.02),
                                 dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.text_fc2 = nn.Dense(cfg.dim,
                                 kernel_init=nn.initializers.normal(0.02),
                                 dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        # time path runs in fp32 (reference: amp.autocast(float32), :1160).
        self.time_fc1 = nn.Dense(cfg.dim,
                                 kernel_init=nn.initializers.normal(0.02),
                                 dtype=jnp.float32,
                                 param_dtype=cfg.param_dtype)
        self.time_fc2 = nn.Dense(cfg.dim,
                                 kernel_init=nn.initializers.normal(0.02),
                                 dtype=jnp.float32,
                                 param_dtype=cfg.param_dtype)
        self.time_proj = nn.Dense(6 * cfg.dim, kernel_init=xavier_uniform(),
                                  dtype=jnp.float32,
                                  param_dtype=cfg.param_dtype)
        if cfg.model_type == "i2v":
            self.img_ln_in = nn.LayerNorm(dtype=jnp.float32,
                                          param_dtype=cfg.param_dtype)
            self.img_fc1 = nn.Dense(cfg.clip_dim,
                                    kernel_init=xavier_uniform(),
                                    dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)
            self.img_fc2 = nn.Dense(cfg.dim, kernel_init=xavier_uniform(),
                                    dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)
            self.img_ln_out = nn.LayerNorm(dtype=jnp.float32,
                                           param_dtype=cfg.param_dtype)
        if cfg.control_adapter:
            # SimpleAdapter: per-frame conv patchifier for Plücker camera
            # maps (undefined in the snapshot, SURVEY.md §2.4; upstream
            # VideoX-Fun defines this Conv2d patchify-and-add)
            self.control_adapter_conv = nn.Conv(
                cfg.dim, kernel_size=cfg.patch_size[1:],
                strides=cfg.patch_size[1:], padding="VALID",
                kernel_init=xavier_uniform(), dtype=cfg.dtype,
                param_dtype=cfg.param_dtype)
        if cfg.ref_conv:
            self.ref_conv_layer = nn.Conv(
                cfg.dim, kernel_size=cfg.patch_size[1:],
                strides=cfg.patch_size[1:], padding="VALID",
                kernel_init=xavier_uniform(), dtype=cfg.dtype,
                param_dtype=cfg.param_dtype)
        if cfg.motion_guidance:
            fd = cfg.motion_feature_dim
            self.feature_adapter_1 = nn.Conv(
                fd, kernel_size=(3, 3), padding=1,
                kernel_init=xavier_uniform(), dtype=cfg.dtype,
                param_dtype=cfg.param_dtype)
            self.feature_adapter_2 = nn.Conv(
                fd, kernel_size=(3, 3), padding=1,
                kernel_init=xavier_uniform(), dtype=cfg.dtype,
                param_dtype=cfg.param_dtype)

        if cfg.scan_blocks:
            block_cls = _ScanBlock
            if cfg.remat:
                block_cls = nn.remat(
                    block_cls, prevent_cse=False,
                    static_argnums=(), policy=remat_policy_of(cfg))
            self.block_stack = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 7,
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name="blocks")
        else:
            # evenly-spaced fraction-p checkpointing (ac_handle.py:16-64):
            # remat ceil(p * L) blocks at stride L / n_ckpt
            blocks = []
            n_ckpt = int(math.ceil(cfg.remat_fraction * cfg.num_layers)) \
                if cfg.remat else 0
            stride = cfg.num_layers / max(n_ckpt, 1)
            ckpt_ids = {int(round(i * stride)) for i in range(n_ckpt)}
            for i in range(cfg.num_layers):
                cls = nn.remat(WanBlock, policy=remat_policy_of(cfg)) \
                    if (cfg.remat and i in ckpt_ids) else WanBlock
                blocks.append(cls(cfg, name=f"blocks_{i}"))
            self.block_list = blocks
        self.head_mod = Head(cfg, name="head")

    # ------------------------------------------------------------------ #

    def embed(self, x, t, context, *, y=None, y_camera=None, clip_fea=None,
              full_ref=None, mpm_features=None, mpm_cls=None, seq_len=None,
              rope_tables: Optional[RopeTables] = None) -> DiTIntermediates:
        """Everything before the block stack (wan_transformer4d.py:1061-1198).

        x: noisy latents [B, T, H, W, C_noise]; y: conditioning latents
        [B, T, H, W, C_cond] concatenated channel-wise; context: text
        embeddings [B, text_len, text_dim]; clip_fea: [B, 257, clip_dim];
        full_ref: [B, H, W, ref_dim]; mpm_features: [B, 196, feat_dim] OmniMAE
        patch tokens of the first frame; t: [B] or [B, L] timesteps.
        """
        cfg = self.cfg
        if y is not None:
            x = jnp.concatenate([x, y], axis=-1)
        b, tt, hh, ww, _ = x.shape

        x = self.patch_embedding(x.astype(cfg.dtype))
        if cfg.control_adapter and y_camera is not None:
            # y_camera: [B, T', H, W, 24] folded Plücker maps; patchified
            # per-frame and added to the video tokens (wan_transformer4d.py
            # :1075-1077)
            bb, tt2, hh2, ww2, cc2 = y_camera.shape
            cam = self.control_adapter_conv(
                y_camera.reshape(bb * tt2, hh2, ww2, cc2).astype(cfg.dtype))
            cam = cam.reshape(bb, tt2, cam.shape[1], cam.shape[2], cfg.dim)
            x = x + cam
        f, h, w = x.shape[1], x.shape[2], x.shape[3]
        grid = (f, h, w)
        tokens = x.reshape(b, f * h * w, cfg.dim)

        ref_tokens = 0
        if cfg.ref_conv and full_ref is not None:
            ref = self.ref_conv_layer(full_ref.astype(cfg.dtype))
            ref = ref.reshape(b, -1, cfg.dim)
            ref_tokens = ref.shape[1]
            tokens = jnp.concatenate([ref, tokens], axis=1)
            grid = (f + 1, h, w)

        true_len = tokens.shape[1]
        if seq_len is None:
            seq_len = true_len
        assert seq_len >= true_len
        if seq_len > true_len:
            tokens = jnp.pad(tokens, ((0, 0), (0, seq_len - true_len),
                                      (0, 0)))
        kv_lens = jnp.full((b,), true_len, jnp.int32)

        if rope_tables is None:
            rope_tables = RopeTables.create(cfg.head_dim)
        rope_cos, rope_sin = rope_angles_3d(rope_tables, grid,
                                            seq_len=seq_len)

        # MPM token grid (4D variant). Note: the reference aligns feature
        # position 0 with token position 0 even when ref tokens are
        # prepended, and zero-pads the FiLM scale/shift beyond the feature
        # length (:772-776) -- reproduced via mpm_mask.
        mpm_tokens, mpm_mask = None, None
        if cfg.motion_guidance and mpm_features is not None:
            fd = cfg.motion_feature_dim
            side = int(math.isqrt(mpm_features.shape[1]))
            feats = mpm_features.reshape(b, side, side, fd).astype(cfg.dtype)
            feats = self.feature_adapter_1(feats)
            feats = nn.silu(feats)
            feats = self.feature_adapter_2(feats)
            feats = jax.image.resize(feats, (b, h, w, fd), method="bilinear")
            if cfg.use_cls_token and mpm_cls is not None:
                # FiLM parameters derive from the pooled cls feature instead;
                # keep the per-position tokens for the padding layout.
                feats = jnp.broadcast_to(mpm_cls[:, None, None, :],
                                         (b, h, w, fd)).astype(cfg.dtype)
            feats = jnp.broadcast_to(feats[:, None], (b, f, h, w, fd))
            feats = feats.reshape(b, f * h * w, fd)
            feat_len = feats.shape[1]
            if seq_len > feat_len:
                feats = jnp.pad(
                    feats, ((0, 0), (0, seq_len - feat_len), (0, 0)))
            mpm_tokens = feats
            mpm_mask = (jnp.arange(seq_len) < feat_len).astype(
                jnp.float32)[:, None]

        # timestep embedding (fp32, :1160-1171)
        t = jnp.asarray(t)
        emb = sinusoidal_embedding(cfg.freq_dim, t.reshape(-1))
        e = self.time_fc2(nn.silu(self.time_fc1(emb)))
        e0 = self.time_proj(nn.silu(e))
        if t.ndim == 2:                       # per-token timesteps [B, L]
            e = e.reshape(b, seq_len, cfg.dim)
            e0 = e0.reshape(b, seq_len, 6, cfg.dim)
        else:
            e = e.reshape(b, cfg.dim)
            e0 = e0.reshape(b, 6, cfg.dim)

        # text context: pad/truncate to text_len, then MLP (:1175-1180)
        lc = context.shape[1]
        if lc < cfg.text_len:
            context = jnp.pad(context,
                              ((0, 0), (0, cfg.text_len - lc), (0, 0)))
        ctx = self.text_fc2(nn.gelu(self.text_fc1(
            context.astype(cfg.dtype)), approximate=True))

        if clip_fea is not None and cfg.model_type == "i2v":
            cf = self.img_ln_in(clip_fea.astype(jnp.float32))
            cf = self.img_fc2(nn.gelu(self.img_fc1(cf.astype(cfg.dtype)),
                                      approximate=False))
            cf = self.img_ln_out(cf.astype(jnp.float32)).astype(cfg.dtype)
            ctx = jnp.concatenate([cf, ctx], axis=1)

        return DiTIntermediates(
            tokens=tokens, e=e, e0=e0, context=ctx, rope_cos=rope_cos,
            rope_sin=rope_sin, kv_lens=kv_lens, mpm_tokens=mpm_tokens,
            mpm_mask=mpm_mask, grid=grid, ref_tokens=ref_tokens)

    def time_embed_e0(self, t):
        """Timestep -> (e [N, D], e0 [N, 6, D]) — the adaLN projection of
        the embed stage in isolation. e0 is the TeaCache decision
        statistic and depends ONLY on t, so a whole denoise schedule's
        skip pattern can be precomputed in one call (offload.py)."""
        cfg = self.cfg
        t = jnp.asarray(t)
        emb = sinusoidal_embedding(cfg.freq_dim, t.reshape(-1))
        e = self.time_fc2(nn.silu(self.time_fc1(emb)))
        e0 = self.time_proj(nn.silu(e))
        return e, e0.reshape(-1, 6, cfg.dim)

    def backbone(self, it: DiTIntermediates) -> jnp.ndarray:
        """The block stack; returns updated tokens (the teacache 'residual'
        is tokens_out - tokens_in, computed by the pipeline)."""
        cfg = self.cfg
        mpm, mask = zero_mpm_fallback(cfg, it.tokens, it.mpm_tokens,
                                      it.mpm_mask)
        if cfg.scan_blocks:
            x, _ = self.block_stack(it.tokens, it.e0, it.context, it.rope_cos,
                                    it.rope_sin, it.kv_lens, mpm, mask)
        else:
            x = it.tokens
            for blk in self.block_list:
                x = blk(x, it.e0, it.context, it.rope_cos, it.rope_sin,
                        it.kv_lens, mpm, mask)
        return x

    def finalize(self, tokens, it: DiTIntermediates) -> jnp.ndarray:
        """Head + unpatchify back to [B, T, H, W, out_dim] (:1309-1366)."""
        cfg = self.cfg
        x = self.head_mod(tokens, it.e)
        f, h, w = it.grid
        if it.ref_tokens:
            x = x[:, it.ref_tokens:]
            f = f - 1
        x = x[:, :f * h * w]
        pt, ph, pw = cfg.patch_size
        c = cfg.out_dim
        b = x.shape[0]
        x = x.reshape(b, f, h, w, pt, ph, pw, c)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return x.reshape(b, f * pt, h * ph, w * pw, c)

    def __call__(self, x, t, context, *, y=None, y_camera=None,
                 clip_fea=None, full_ref=None, mpm_features=None,
                 mpm_cls=None, seq_len=None, rope_tables=None):
        it = self.embed(x, t, context, y=y, y_camera=y_camera,
                        clip_fea=clip_fea, full_ref=full_ref,
                        mpm_features=mpm_features, mpm_cls=mpm_cls,
                        seq_len=seq_len, rope_tables=rope_tables)
        tokens = self.backbone(it)
        return self.finalize(tokens, it)

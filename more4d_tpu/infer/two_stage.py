"""Full two-stage inference: single image -> 4D novel-view videos.

Re-implements scripts/inference/infer.py:1092-1142 (SURVEY.md §3.3):

STAGE 1 (4D-STraG): monocular depth -> back-projected first-frame point
cloud; the control pipeline samples a dense 3D trajectory video conditioned
on text, the repeated first frame, a grey CLIP image (the flow-model trick,
utils/utils.py:82-175), and the depth image; the decoder adaptor maps the
decoded pseudo-RGB back to scene flow; inverse normalization recovers
absolute per-frame point clouds (:848-871).

RENDER: the per-frame point cloud is rendered along the 11-type camera
trajectory sweep (:906-924) with the splat or z-buffer renderer; holes
become inpainting masks.

STAGE 2 (4D-ViSM): the Wan-Fun-InP pipeline (with the ViSM LoRA merged)
fills disocclusions per (sample x trajectory) (:961-989).

Depth comes from any callable image -> depth map; the reference's UniDepthV2
is one provider (a JAX port is tracked separately); precomputed depth maps
work directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import (back_project_coords, get_intrinsic_matrix,
                        inverse_flow_norm)
from ..geometry.cameras import TRAJECTORY_TYPES, generate_trajectory
from ..geometry.render import zbuffer_render_sweep, zbuffer_render_video
from ..kernels.gs_splat import gs_render_sweep, gs_render_tiled_video
from ..models.adaptors import VAEDecoderAdaptor
from ..pipelines import WanControlPipeline, WanInpaintPipeline


@dataclasses.dataclass
class TwoStageModels:
    """Bundles models + params. Text/CLIP/MPM encoders run through the
    provided callables so tests can inject tiny stand-ins."""

    control_pipeline: WanControlPipeline
    inpaint_pipeline: WanInpaintPipeline
    dit4d_params: Any
    dit_inp_params: Any
    vae_params: Any
    decoder_adaptor: VAEDecoderAdaptor
    decoder_adaptor_params: Any
    encode_text: Callable[[Sequence[str]], jnp.ndarray]
    encode_image_clip: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    extract_mpm: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    estimate_depth: Optional[Callable[[np.ndarray], np.ndarray]] = None


def grey_clip_image(batch: int, size: int = 512) -> jnp.ndarray:
    """The flow model is conditioned on a *grey* (127,127,127) clip image
    (get_image_to_flow_video_latent, utils/utils.py:158-165; infer.py:813).
    Value in [-1, 1] space: 2*(127/255) - 1."""
    grey = 2.0 * (127.0 / 255.0) - 1.0
    return jnp.full((batch, size, size, 3), grey, jnp.float32)


def depth_to_image(depth: jnp.ndarray):
    """Depth [H, W] -> 3ch conditioning image in [-1, 1] via per-image
    min-max normalization (infer.py:823-827): clamp to [0, 1e4], replace
    non-finite/near-zero values with 1, then 2*(d-min)/(max-min+1e-8)-1."""
    d = jnp.clip(depth, 0.0, 10000.0)
    bad = ~jnp.isfinite(d) | (d < 1e-5)
    d = jnp.where(bad, 1.0, d)
    dmin, dmax = jnp.min(d), jnp.max(d)
    d = 2.0 * (d - dmin) / (dmax - dmin + 1e-8) - 1.0
    return jnp.repeat(d[None, None, ..., None], 3, axis=-1)


def stage1_generate(m: TwoStageModels, image01: np.ndarray, prompt: str,
                    negative_prompt: str = "", depth: Optional[np.ndarray] = None,
                    rng: Optional[jax.Array] = None, normalize_track_z: bool = False,
                    use_depth: bool = True
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """image01: [H, W, 3] in [0, 1]. Returns (coords [T, H*W, 3] absolute
    per-frame point clouds, colors [H*W, 3] in [0, 1]).

    use_depth=False drops the depth-image conditioning channels (48ch
    ``y``, the reference's --use_depth off / un-adapted 4D DiT,
    infer.py:558-560); the depth map is still estimated for the
    back-projection lift (:818-820 runs unconditionally)."""
    pipe = m.control_pipeline
    h, w = pipe.config.height, pipe.config.width
    t_frames = pipe.config.num_frames
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    if depth is None:
        assert m.estimate_depth is not None, "no depth provider"
        depth = m.estimate_depth(image01)
    depth = jnp.asarray(depth, jnp.float32)

    # lift: depth -> per-pixel 3D coordinates (infer.py:818-820)
    first_frame_coords = back_project_coords(depth, h, w)  # [H, W, 3]

    image = jnp.asarray(image01, jnp.float32) * 2.0 - 1.0
    image = jax.image.resize(image, (h, w, 3), "bilinear")
    control_video = jnp.broadcast_to(image[None, None],
                                     (1, t_frames, h, w, 3))
    depth_img = None
    if use_depth:
        depth_img = depth_to_image(depth)
        depth_img = jax.image.resize(depth_img, (1, 1, h, w, 3),
                                     "bilinear")

    prompt_embeds = m.encode_text([prompt])
    neg_embeds = m.encode_text([negative_prompt])
    clip_fea = None
    if m.encode_image_clip is not None:
        # Encode an actual mid-grey image through CLIP and use those
        # features — NOT a zeroed embedding (utils.py:158-165, infer.py:813).
        clip_fea = m.encode_image_clip(grey_clip_image(1, size=max(h, w)))
    mpm = None
    if m.extract_mpm is not None:
        mpm = m.extract_mpm(jnp.asarray(image01, jnp.float32)[None])

    flow_video = pipe(m.dit4d_params, m.vae_params, rng, prompt_embeds,
                      neg_embeds=neg_embeds, control_video=control_video,
                      start_image=image[None, None], depth_image=depth_img,
                      clip_fea=clip_fea, mpm_features=mpm,
                      output_type="no_normalize")          # [1,T,H,W,3]

    # decoded pseudo-RGB -> scene flow (infer.py:848-849)
    recon_flow = m.decoder_adaptor.apply(m.decoder_adaptor_params,
                                         flow_video)

    if normalize_track_z:
        coords_video = recon_flow + first_frame_coords[None, None]
    else:
        coords_video, _ = inverse_flow_norm(recon_flow,
                                            first_frame_coords[None])

    # frame 0 is the exact lifted cloud (infer.py:870-871)
    coords_video = jnp.concatenate(
        [first_frame_coords[None, None], coords_video[:, 1:]], axis=1)

    coords = np.asarray(coords_video[0]).reshape(t_frames, -1, 3)
    colors = np.asarray(image * 0.5 + 0.5).reshape(-1, 3)
    return coords, colors


def render_trajectories(coords: np.ndarray, colors: np.ndarray,
                        height: int, width: int,
                        trajectory_types=None, use_gs: bool = True,
                        batched: bool = True
                        ) -> List[Dict[str, np.ndarray]]:
    """Render the camera sweep for per-frame point clouds.

    coords: [T, N, 3]; colors: [N, 3] in [0, 1]. Returns a list of
    {'name', 'frames' [T,H,W,3], 'mask' [T,H,W]} per trajectory.

    ``batched``: render the WHOLE sweep as one dispatch — trajectories
    differ only in extrinsics, so all K x T frames concatenate along the
    frame axis (the reference loops trajectories serially,
    infer.py:906-924; one dispatch amortizes the per-call relay latency
    and lets the Pallas rasteriser fill the chip).  Falls back to the
    serial loop on memory pressure."""
    trajectory_types = trajectory_types or TRAJECTORY_TYPES
    t = coords.shape[0]
    # center from the FIRST frame's cloud only (the reference dispatcher:
    # first_frame_coords = coords_data[0], infer.py render_trajectory) —
    # the depth-proportional radii scale off center[2], and an all-frame
    # mean would drift the sweep amplitude on dynamic scenes
    center = coords[0].reshape(-1, 3).mean(axis=0)
    intr = get_intrinsic_matrix(height, width)
    # names carry the CANONICAL sweep index (a subset run of trajectory
    # 3 writes circle_rotating_3, matching the full-sweep filename, not
    # circle_rotating_0 — which would collide with a different camera
    # path from another subset run); unknown custom entries fall back to
    # their position
    names = []
    for i, tt in enumerate(trajectory_types):
        try:
            idx = TRAJECTORY_TYPES.index(tt)
        except ValueError:
            idx = i
        names.append(f"{tt[0]}_{idx}")
    exts_list = [generate_trajectory(name, center, t, **kw)
                 for name, kw in trajectory_types]

    if batched and len(trajectory_types) > 1:
        zb_frames = hole = frames = _alpha = None
        try:
            k = len(trajectory_types)
            exts_all = jnp.asarray(np.concatenate(
                [np.asarray(e) for e in exts_list], axis=0))
            coords_j = jnp.asarray(coords)  # ONE copy; frame j uses j % T
            cj = jnp.asarray(colors)
            # mask ALWAYS from the z-buffer hole mask (infer.py:906-924)
            zb_frames, hole = zbuffer_render_sweep(
                coords_j, cj, exts_all, intr, height, width)
            frames = zb_frames
            if use_gs:
                frames, _alpha = gs_render_sweep(
                    coords_j, cj, exts_all, intr, height, width)
            # np.asarray forces the async dispatch inside the try
            frames = np.asarray(frames).reshape(k, t, height, width, -1)
            hole = np.asarray(hole).reshape(k, t, height, width)
            return [{"name": n, "frames": frames[i], "mask": hole[i]}
                    for i, n in enumerate(names)]
        except Exception as e:
            # ONLY memory pressure falls back to the serial loop — any
            # other failure of the sweep renderers is a real bug and must
            # surface, not be silently papered over
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            del zb_frames, hole, frames, _alpha  # free before re-render

    out = []
    for name_i, exts in zip(names, exts_list):
        zb_frames, hole = zbuffer_render_video(
            jnp.asarray(coords), jnp.asarray(colors),
            jnp.asarray(exts), intr, height, width)
        if use_gs:
            # Pallas tile rasteriser (6x the XLA soft splat on TPU; the
            # soft splat in geometry/gaussians.py remains the
            # differentiable path)
            frames, _alpha = gs_render_tiled_video(
                jnp.asarray(coords), jnp.asarray(colors),
                jnp.asarray(exts), intr, height, width)
        else:
            frames = zb_frames
        out.append({"name": name_i, "frames": np.asarray(frames),
                    "mask": np.asarray(hole)})
    return out


def stage2_inpaint(m: TwoStageModels, render: Dict[str, np.ndarray],
                   prompt: str, negative_prompt: str = "",
                   rng: Optional[jax.Array] = None) -> np.ndarray:
    """Fill disocclusions of one rendered trajectory. Returns [T,H,W,3]
    in [0, 1]."""
    rng = rng if rng is not None else jax.random.PRNGKey(1)
    return stage2_inpaint_batch(m, [render], prompt, negative_prompt,
                                rng=rng)[0]


def stage2_inpaint_dp(m: TwoStageModels,
                      renders: Sequence[Dict[str, np.ndarray]],
                      prompt: str, negative_prompt: str = "",
                      rng: Optional[jax.Array] = None,
                      mesh=None, shared_noise: bool = False) -> np.ndarray:
    """Trajectory-sweep DATA PARALLELISM: inpaint K rendered trajectories
    with the batch sharded one-per-chip over ``mesh``'s (dcn, data) axes.

    This is the <60 s north-star deployment shape (BASELINE.md, v5p-8):
    the reference's default 11-trajectory sweep (infer.py:51,906-924) is
    embarrassingly parallel, so VAE encode, the 50-step denoise, and the
    decode each run as ONE sharded program with zero cross-chip traffic —
    wall time is the serial sweep divided by the mesh's batch extent.
    K is padded up to a multiple of that extent by repeating the last
    render (idle-slot work, sliced off on return).

    Zero-communication is enforced: any globally-installed Ulysses
    sequence-parallel mesh (``parallel.set_mesh``, e.g. from a stage-1
    ``--sp`` run) is cleared for the duration — otherwise every
    self-attention would shard_map over the stale seq axis, replicating
    the whole CFG-doubled trajectory batch onto every chip."""
    from ..parallel import get_mesh, set_mesh
    from ..parallel.mesh import AXIS_DATA, AXIS_DCN, data_sharding

    if mesh is None:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), (AXIS_DATA,))
    rng = rng if rng is not None else jax.random.PRNGKey(1)
    pipe = m.inpaint_pipeline
    k = len(renders)
    dp = (mesh.shape.get(AXIS_DCN, 1) * mesh.shape.get(AXIS_DATA, 1))
    k_pad = -(-k // dp) * dp
    padded = list(renders) + [renders[-1]] * (k_pad - k)

    def shard(a):
        return jax.device_put(a, data_sharding(mesh, a.ndim))

    # noise for the REAL k first, pad rows by repetition: the same rng
    # then yields the same videos as the serial sweep on any mesh size
    # (shared_noise = the reference's per-trajectory re-seed semantics,
    # infer.py:957-959 — one noise row repeated across the sweep)
    if shared_noise:
        latents = jnp.repeat(pipe.prepare_latents(rng, 1), k, axis=0)
    else:
        latents = pipe.prepare_latents(rng, k)
    if k_pad > k:
        latents = jnp.concatenate(
            [latents, jnp.repeat(latents[-1:], k_pad - k, axis=0)], axis=0)
    latents = shard(latents)
    video_k = shard(jnp.asarray(
        np.stack([r["frames"] for r in padded]), jnp.float32) * 2.0 - 1.0)
    mask_k = shard(jnp.asarray(
        np.stack([r["mask"] for r in padded]), jnp.float32)[..., None])
    prompt_embeds = shard(jnp.tile(m.encode_text([prompt]), (k_pad, 1, 1)))
    neg_embeds = shard(jnp.tile(m.encode_text([negative_prompt]),
                                (k_pad, 1, 1)))
    clip_fea = None
    if m.encode_image_clip is not None:
        # encode only the k REAL renders; pad rows repeat the last
        # embedding (each encode is a separate serial dispatch — sec/call
        # on the relay backend — so duplicates are pure waste)
        clip_fea = jnp.concatenate(
            [m.encode_image_clip(jnp.asarray(r["frames"][:1]) * 2.0 - 1.0)
             for r in renders], axis=0)
        if k_pad > k:
            clip_fea = jnp.concatenate(
                [clip_fea, jnp.repeat(clip_fea[-1:], k_pad - k, axis=0)],
                axis=0)
        clip_fea = shard(clip_fea)
    prev_mesh = get_mesh()
    set_mesh(None)
    try:
        with mesh:
            y = pipe.prepare_conditions(m.vae_params, latents.shape,
                                        video_k, mask_k)
            lat = pipe.denoise(m.dit_inp_params, latents, prompt_embeds,
                               neg_embeds, y=y, clip_fea=clip_fea)
            out = pipe.decode_latents(m.vae_params, lat)
    finally:
        set_mesh(prev_mesh)
    return np.asarray(out)[:k]


def stage2_inpaint_batch(m: TwoStageModels,
                         renders: Sequence[Dict[str, np.ndarray]],
                         prompt: str, negative_prompt: str = "",
                         rng: Optional[jax.Array] = None,
                         decode_chunk: int = 1,
                         denoise_group: Optional[int] = None,
                         shared_noise: bool = False,
                         async_out: bool = False) -> np.ndarray:
    """Fill disocclusions of K rendered trajectories with a batched
    encode + grouped denoise.

    ``async_out=True`` returns the decoded chunks as DEVICE arrays
    instead of one fenced numpy stack — the two-deep pipelined sweep
    (run_two_stage) reads trajectory i back while trajectory i+1 is
    already computing.

    The reference runs the 11-trajectory sweep serially
    (infer.py:961-989); here the VAE *encode* of the K masked videos runs
    as ONE batched call (a [K,T,H,W,3] video stack is only ~K x 110 MB;
    the encode activations dominate and the fallback drops to
    per-trajectory encodes if the stacked graph exhausts HBM), the 50-step
    denoise runs in groups of ``denoise_group`` trajectories (None = all K
    in one loop; measured on the 16 GiB v5e, small groups beat one big
    batch — the batch-8-CFG loop's working set thrashes HBM), and the
    final *decode* runs in ``decode_chunk`` groups.
    Returns [K,T,H,W,3] in [0, 1]."""
    rng = rng if rng is not None else jax.random.PRNGKey(1)
    pipe = m.inpaint_pipeline
    k = len(renders)
    if shared_noise:
        # reference semantics: the sweep re-seeds manual_seed(seed+1) for
        # EVERY trajectory (infer.py:957-959), so all K inpaints start
        # from the SAME initial latent noise
        latents = jnp.repeat(pipe.prepare_latents(rng, 1), k, axis=0)
    else:
        latents = pipe.prepare_latents(rng, k)

    y, clips = None, []
    if k > 1:
        video_k = mask_k = None
        try:
            video_k = jnp.asarray(
                np.stack([r["frames"] for r in renders]),
                jnp.float32) * 2.0 - 1.0
            mask_k = jnp.asarray(np.stack([r["mask"] for r in renders]),
                                 jnp.float32)[..., None]
            y = pipe.prepare_conditions(m.vae_params, latents.shape,
                                        video_k, mask_k)
            # force the dispatch INSIDE the try: execution is async (and
            # block_until_ready is a no-op on the relay backend), so
            # without a readback a RESOURCE_EXHAUSTED would surface later
            # inside denoise, past this fallback
            float(jnp.sum(jnp.abs(y[..., :1]).astype(jnp.float32)))
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            y = None  # -> per-trajectory encodes
        finally:
            del video_k, mask_k  # k x ~150 MB must not outlive the try
    if y is None:
        ys = []
        for r in renders:
            video = jnp.asarray(r["frames"], jnp.float32)[None] * 2.0 - 1.0
            mask = jnp.asarray(r["mask"], jnp.float32)[None, ..., None]
            ys.append(pipe.prepare_conditions(
                m.vae_params, latents[:1].shape, video, mask))
        y = jnp.concatenate(ys, axis=0)
    if m.encode_image_clip is not None:
        clips = [m.encode_image_clip(
            jnp.asarray(r["frames"][:1]) * 2.0 - 1.0) for r in renders]
    clip_fea = jnp.concatenate(clips, axis=0) if clips else None
    prompt_embeds = jnp.tile(m.encode_text([prompt]), (k, 1, 1))
    neg_embeds = jnp.tile(m.encode_text([negative_prompt]), (k, 1, 1))

    g = k if denoise_group is None else max(int(denoise_group), 1)
    lat_groups = []
    for i in range(0, k, g):
        lat_groups.append(pipe.denoise(
            m.dit_inp_params, latents[i:i + g], prompt_embeds[i:i + g],
            neg_embeds[i:i + g], y=y[i:i + g],
            clip_fea=None if clip_fea is None else clip_fea[i:i + g]))
    latents = jnp.concatenate(lat_groups, axis=0) if len(lat_groups) > 1 \
        else lat_groups[0]
    dc = max(decode_chunk, 1)
    if async_out:
        # device arrays, no host readback: the caller overlaps the
        # ~110 MB/trajectory transfer with the next trajectory's compute
        return [pipe.decode_latents(m.vae_params, latents[i:i + dc])
                for i in range(0, k, dc)]
    outs = [np.asarray(pipe.decode_latents(m.vae_params,
                                           latents[i:i + dc]))
            for i in range(0, k, dc)]
    return np.concatenate(outs, axis=0)


def run_two_stage(m: TwoStageModels, image01: np.ndarray, prompt: str,
                  negative_prompt: str = "",
                  depth: Optional[np.ndarray] = None,
                  trajectory_types=None, use_gs: bool = True,
                  rng: Optional[jax.Array] = None,
                  stage2_batch: int = 1,
                  stage2_denoise_group: Optional[int] = None,
                  sweep_mesh=None, stage2_shared_noise: bool = True):
    """Single image -> list of inpainted novel-view videos (one per camera
    trajectory), plus the stage-1 point clouds.

    stage2_shared_noise (default True, matching the CLI and the
    reference's per-trajectory manual_seed(seed+1) re-seed,
    infer.py:957-959): every trajectory inpaints from the same initial
    noise; False draws independent noise per trajectory.

    ``stage2_batch``: how many trajectories to inpaint per batched
    pipeline call (the VAE encode batches across the whole group).
    1 (the default) reproduces the reference's serial sweep, which also
    measures fastest on a 16 GiB v5e at 1.3B; k>=6 exhausts HBM there.
    ``stage2_denoise_group``: denoise-loop batch within a stage2_batch
    group (None = whole group) — lets the encode batch wide while the
    denoise stays narrow on memory-tight chips. Larger chips can raise
    both.
    ``sweep_mesh``: a device mesh for data-parallel trajectory fan-out —
    the whole sweep runs as one sharded stage-2 call (stage2_inpaint_dp)
    and stage2_batch/stage2_denoise_group are ignored."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    coords, colors = stage1_generate(m, image01, prompt, negative_prompt,
                                     depth=depth, rng=r1)
    pipe = m.inpaint_pipeline
    renders = render_trajectories(coords, colors, pipe.config.height,
                                  pipe.config.width, trajectory_types,
                                  use_gs)
    videos = []
    if sweep_mesh is not None:
        # fold_in(r2, 0) = the serial branch's first (and, at
        # stage2_batch >= k, only) chunk rng — same seed, same videos
        # whichever branch runs
        outs = stage2_inpaint_dp(m, renders, prompt, negative_prompt,
                                 rng=jax.random.fold_in(r2, 0),
                                 mesh=sweep_mesh,
                                 shared_noise=stage2_shared_noise)
        videos = [{"name": r["name"], "video": out}
                  for r, out in zip(renders, outs)]
    else:
        # Two-deep pipelined sweep (VERDICT r4 item: overlap trajectory
        # i's decoded-video host readback with trajectory i+1's
        # encode/denoise/decode device work).  Each chunk's chain is
        # DISPATCHED (async_out device arrays), then the PREVIOUS chunk's
        # frames are read back — one fence per chunk pair, which respects
        # the measured relay constraint that fully-unfenced queueing
        # degrades (47.8 s vs 28.3 s per 3 trajectories, round 3).
        pending = None  # (chunk, device-array list)

        def _drain(p):
            chunk_r, devs = p
            outs = np.concatenate([np.asarray(d) for d in devs], axis=0)
            for render, out in zip(chunk_r, outs):
                videos.append({"name": render["name"], "video": out})

        for c0 in range(0, len(renders), max(stage2_batch, 1)):
            chunk = renders[c0:c0 + max(stage2_batch, 1)]
            devs = stage2_inpaint_batch(
                m, chunk, prompt, negative_prompt,
                # shared noise must match ACROSS chunks: fixed chunk rng
                rng=jax.random.fold_in(r2, 0 if stage2_shared_noise
                                       else c0),
                denoise_group=stage2_denoise_group,
                shared_noise=stage2_shared_noise, async_out=True)
            if pending is not None:
                _drain(pending)
            pending = (chunk, devs)
        if pending is not None:
            _drain(pending)
    return {"coords": coords, "colors": colors, "renders": renders,
            "videos": videos}

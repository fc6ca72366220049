"""more4d_tpu — a TPU-native JAX framework for single-image -> 4D synthesis.

Re-implements the capabilities of the MoRe4D pipeline (4D-STraG scene-trajectory
generation + 4D-ViSM novel-view synthesis on the Wan2.1-Fun video-diffusion
stack) as an idiomatic JAX/XLA/Pallas framework:

- ``more4d_tpu.models``    — Wan DiT (3D/4D), causal video VAE, VAE trajectory
  adaptors, umT5 text encoder, CLIP image encoder, OmniMAE feature extractor.
- ``more4d_tpu.kernels``   — Pallas TPU kernels (flash attention, splatting).
- ``more4d_tpu.diffusion`` — flow-matching schedulers (Euler, DPM++, UniPC).
- ``more4d_tpu.geometry``  — projection/unprojection, depth-guided motion
  normalization, z-buffer point rendering, camera trajectories.
- ``more4d_tpu.pipelines`` — jitted two-stage inference pipelines.
- ``more4d_tpu.parallel``  — device mesh, sharding rules, sequence parallelism.
- ``more4d_tpu.train``     — training loops (VAE adaptors, 4D-STraG, ViSM LoRA).
"""

__version__ = "0.1.0"

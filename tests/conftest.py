"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analogue of the reference's file-rendezvous multi-process
test bootstrap (MoRe4D/models/omnivision/utils/testing.py:51): sharding and
collective code paths are exercised without real multi-chip hardware.

Note: this environment's sitecustomize registers a TPU PJRT plugin and forces
jax_platforms before conftest runs, so the env-var route is not enough — we
override via jax.config as well.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

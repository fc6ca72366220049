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

# Persistent XLA compilation cache: test wall time is dominated by CPU
# compiles of the tiny models, which are identical run-to-run. First run
# populates the cache; repeat quick-tier runs finish in well under 3 min.
#
# The dir is FINGERPRINTED by the host CPU's feature flags: XLA:CPU AOT
# executables are machine-specific, and loading an entry produced on a
# host with different features SIGSEGVs/SIGILLs the test process (observed
# round 3: entries from a wider-featured machine crashed this one inside
# compilation_cache.get_executable_and_time).
def _cpu_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    f"~/.cache/more4d_jax_tests_{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# ---- quick/slow tiers -----------------------------------------------------
# Golden tests rebuild the reference torch models per module and the
# integration tests run multi-step pipelines — mark them slow so
# `pytest -m "not slow"` gives a fast signal (full suite stays the default).
_SLOW_MODULES = {
    "test_dit_golden", "test_vae_golden", "test_t5_golden",
    "test_clip_golden", "test_omnimae_golden", "test_xlm_roberta_golden",
    "test_adaptors_golden", "test_schedulers_golden", "test_unidepth",
    "test_pipelines", "test_two_stage", "test_train_harness",
    "test_stage_clis", "test_infer_cli", "test_check_wan",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


# ---- compiler-state hygiene ------------------------------------------------
# The XLA:CPU compiler segfaults deterministically after ~160 compiles in one
# process (observed round 3: full-suite run crashed inside
# backend_compile_and_load on test_wan_dit's grad-through-remat-scan test;
# every test passes in isolation or in smaller batches).  Clearing JAX's
# executable caches between modules bounds the accumulated compiler state;
# cross-module tests never share compiled fns, so only wall time is affected
# (and the persistent on-disk cache absorbs most of that).
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiler_state():
    yield
    jax.clear_caches()

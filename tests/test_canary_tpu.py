"""Production-tile kernel canary as a pytest (VERDICT r4 #3).

The CPU-interpret flash-attention tests (tests/test_flash_attention.py)
prove numerics but cannot see the TPU's 16 MiB scoped-VMEM envelope — the
round-4 kernel regression passed them while being uncompilable at the
operating point.  This test runs bench.py's canary mode in a subprocess on
the REAL TPU backend (the suite's conftest pins in-process JAX to the CPU
mesh), compiling the flash fwd, bwd, and remat-policy-wrapped graphs at the
exact production tile (block_q=512, adaptive block_k at L=9568).

Opt-in: set MORE4D_TPU_TESTS=1 (needs the TPU relay; ~15 s warm-cache,
~60 s cold).  Select with `pytest -m tpu`.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("MORE4D_TPU_TESTS") != "1",
                    reason="real-TPU canary: set MORE4D_TPU_TESTS=1 "
                           "(needs the TPU relay)")
def test_production_tile_canary():
    env = dict(os.environ, MORE4D_BENCH_MODE="canary")
    env.pop("JAX_PLATFORMS", None)  # run on the real backend
    r = subprocess.run([sys.executable, "bench.py"], env=env,
                       capture_output=True, text=True, timeout=420,
                       cwd=_REPO)
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert lines, r.stdout[-2000:]
    out = json.loads(lines[-1])["extra"]
    assert out.get("ok") is True, out

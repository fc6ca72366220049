"""Tracing / profiling utilities.

The TPU counterpart of the reference's cuda-synchronized ``timer`` /
``timer_record`` decorators (MoRe4D/utils/utils.py:407-466): wall timing
with forced device sync, plus jax.profiler traces (viewable in
TensorBoard/XProf) replacing DeepSpeed's wall_clock_breakdown.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def _sync(result):
    for leaf in jax.tree_util.tree_leaves(result):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return result


def timer(label: Optional[str] = None, sync: bool = True):
    """Decorator printing wall time per call (device-synced)."""

    def deco(fn):
        name = label or fn.__name__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            if sync:
                _sync(out)
            print(f"[timer] {name}: {time.perf_counter() - t0:.3f}s")
            return out

        return wrapper

    return deco


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/more4d_trace"):
    """jax.profiler trace context: `with trace(): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

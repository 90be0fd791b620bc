"""Profiling/tracing harness.

The reference's profiling surface is a callgrind toggle macro
(reference base/profile/callgrind.h:17-25, guarded by SXT_USE_CALLGRIND) plus
cudaProfiler includes in benchmarks; SURVEY.md §5.1 names `jax.profiler`
traces as the TPU-native upgrade. This module is that:

- ``trace(label)``: context manager writing a TensorBoard/XProf trace to
  ``$BLITZAR_TPU_PROFILE_DIR/<label>`` when the env var is set, else a
  no-op (exactly the toggle-under-env-flag shape of the reference macro).
- ``annotate(name)``: `jax.profiler.TraceAnnotation` wrapper for marking
  host-side phases inside a trace (visible in the trace viewer).
- ``sync_time(fn)``: D2H-synced wall-clock timing — on the axon tunnel
  platform `block_until_ready` does not actually block, so timing forces a
  device-to-host transfer of one leaf.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import numpy as np

ENV_DIR = "BLITZAR_TPU_PROFILE_DIR"


def profile_dir() -> str | None:
    return os.environ.get(ENV_DIR) or None


@contextlib.contextmanager
def trace(label: str):
    """Write a jax.profiler trace for the enclosed block when
    $BLITZAR_TPU_PROFILE_DIR is set; no-op otherwise."""
    base = profile_dir()
    if not base:
        yield None
        return
    path = os.path.join(base, label)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield path


def annotate(name: str):
    """Named host-side phase marker inside a trace."""
    return jax.profiler.TraceAnnotation(name)


def _force(x):
    """Force completion by pulling one leaf to host (the tunnel platform's
    block_until_ready returns before execution finishes)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[-1])
    return x


def sync_time(fn, *args, repeats: int = 1, **kwargs):
    """Run fn(*args, **kwargs) `repeats` times, forcing completion each
    time; returns (best_seconds, last_result)."""
    best = float("inf")
    result = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = _force(fn(*args, **kwargs))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, result

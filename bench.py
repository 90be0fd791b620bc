#!/usr/bin/env python
"""Headline benchmark: ristretto255 fixed-generator MSM throughput, one chip.

Mirrors the reference's multi_exp_pip benchmark (reference
benchmark/multi_exp_pip/README.md): a multiexp handle is precomputed once
(partition tables), then queries are timed with device-resident scalars.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numeric tables (BASELINE.md), so vs_baseline
is reported against BLITZAR_TPU_BASELINE_PPS if set, else null.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

# honor JAX_PLATFORMS through jax.config: the axon sitecustomize backend
# hook ignores the env var and would hang dialing the tunnel when it is down
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
else:
    # No platform pinned: probe the TPU tunnel in a SUBPROCESS with a hard
    # timeout (backend init blocks inside C when the tunnel is down, so an
    # in-process attempt could never be recovered) and fall back to cpu so
    # this script always completes and prints its JSON line.
    import subprocess

    probe_s = float(os.environ.get("BLITZAR_TPU_BENCH_PROBE_S", "150"))
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=probe_s,
            capture_output=True,
        )
        tpu_ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        tpu_ok = False
    if not tpu_ok:
        print(
            "bench.py: TPU tunnel unreachable within "
            f"{probe_s:.0f}s, falling back to cpu",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        # cpu at the TPU default shape would take hours; shrink unless the
        # caller pinned shapes explicitly
        os.environ.setdefault("BLITZAR_TPU_BENCH_LOG_N", "14")
from blitzar_tpu.utils.cache import configure as _configure_cache

_configure_cache(jax.config, tag="bench")

import jax.numpy as jnp

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import fixed
from blitzar_tpu.utils import profiling

LOG_N = int(os.environ.get("BLITZAR_TPU_BENCH_LOG_N", "20"))
NUM_OUTPUTS = int(os.environ.get("BLITZAR_TPU_BENCH_OUTPUTS", "1"))
NBYTES = 32
SAMPLES = int(os.environ.get("BLITZAR_TPU_BENCH_SAMPLES", "3"))
# w=8 tables store 32 bf16-split points per input point (~8.6 GB at 2^20)
WINDOW = int(os.environ.get("BLITZAR_TPU_BENCH_WINDOW", "8" if LOG_N <= 20 else "4"))


def main():
    n = 1 << LOG_N
    # NOTE: a background-thread AOT precompile (overlapping the cold XLA
    # compiles with generator derivation) was tried and removed — on this
    # 1-core host the threads' Python tracing (never cached) starves the
    # warm path and inflated setup_s 18 s -> 115 s. The driver environment
    # keeps /tmp warm across rounds, so bench stays sequential.

    # device/tunnel init before any timer (the reference's sxt_init runs a
    # warm-up MSM for the same reason, gpu_backend.cc:80-101): the first op
    # on the tunnel pays ~30 s of connection/backend warmup that is library
    # init, not handle-setup work
    np.asarray(jnp.zeros((1,), jnp.uint32))

    t0 = time.time()
    points = gen.ristretto_generators(n)
    np.asarray(points.x[:1, :1])  # generators resident before the build
    t_gen = time.time() - t0
    handle = fixed.MultiexpHandle(points, window_width=WINDOW)
    np.asarray(handle.t_split[:1, :1, :1])  # force completion
    t_setup = time.time() - t0
    # steady-state build (program already traced + loaded): what repeated
    # handle builds cost in a live process — the first build's extra ~40-60 s
    # is one-time executable deserialization through the tunnel service
    t0 = time.time()
    handle2 = fixed.MultiexpHandle(points, window_width=WINDOW)
    np.asarray(handle2.t_split[:1, :1, :1])
    t_setup2 = time.time() - t0
    del handle2, points

    rng = np.random.default_rng(97834978)
    scalars = rng.integers(0, 256, size=(NUM_OUTPUTS, n, NBYTES), dtype=np.uint8)
    n_table = handle.num_groups * handle.window_width
    if n < n_table:
        scalars = np.pad(scalars, ((0, 0), (0, n_table - n), (0, 0)))
    sdev = jnp.asarray(scalars)

    t0 = time.time()
    out = fixed._query_jit(
        handle.t_split, sdev, WINDOW, NUM_OUTPUTS, 8 * NBYTES, ed
    )
    np.asarray(out.x[:, :1])
    t_compile = time.time() - t0

    times = []
    with profiling.trace("fixed_msm_query"):  # no-op unless $BLITZAR_TPU_PROFILE_DIR
        for _ in range(SAMPLES):
            t0 = time.time()
            out = fixed._query_jit(
                handle.t_split, sdev, WINDOW, NUM_OUTPUTS, 8 * NBYTES, ed
            )
            np.asarray(out.x[:, :1])  # D2H forces real completion on the tunnel
            times.append(time.time() - t0)

    best = min(times)
    pps = NUM_OUTPUTS * n / best
    encoded = np.asarray(rst.encode(out)).T  # sanity: encodable output
    assert encoded.shape == (NUM_OUTPUTS, 32)

    # default baseline: the round-1 driver-captured number (BENCH_r01.json,
    # 8.64M pts/s) so vs_baseline tracks progress across rounds; the
    # reference publishes no numeric tables (BASELINE.md)
    baseline = os.environ.get("BLITZAR_TPU_BASELINE_PPS") or (
        "8640000" if LOG_N == 20 and NUM_OUTPUTS == 1 else None
    )
    result = {
        "metric": f"ristretto255_fixed_msm_2^{LOG_N}x{NUM_OUTPUTS}_points_per_s",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / float(baseline), 3) if baseline else None,
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "best_ms": round(best * 1e3, 2),
                    "all_ms": [round(t * 1e3, 2) for t in times],
                    "setup_s": round(t_setup, 1),
                    "setup_gen_s": round(t_gen, 1),
                    "setup_steady_s": round(t_setup2, 1),
                    "compile_s": round(t_compile, 1),
                    "window_width": WINDOW,
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

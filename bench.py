#!/usr/bin/env python
"""Headline benchmark: ristretto255 Pedersen MSM throughput on one chip.

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

jax.config.update("jax_compilation_cache_dir", "/tmp/blitzar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from blitzar_tpu import generators as gen
from blitzar_tpu.msm import engine

LOG_N = int(os.environ.get("BLITZAR_TPU_BENCH_LOG_N", "20"))
NUM_OUTPUTS = int(os.environ.get("BLITZAR_TPU_BENCH_OUTPUTS", "1"))
NBYTES = 32
SAMPLES = int(os.environ.get("BLITZAR_TPU_BENCH_SAMPLES", "3"))


def main():
    n = 1 << LOG_N
    t0 = time.time()
    points = gen.ristretto_generators(n)
    jax.block_until_ready(points.x)
    t_gen = time.time() - t0

    rng = np.random.default_rng(97834978)
    scalars = rng.integers(0, 256, size=(NUM_OUTPUTS, n, NBYTES), dtype=np.uint8)
    digits = engine.digit_decompose(jnp.asarray(scalars))
    signs = jnp.zeros((NUM_OUTPUTS, n), jnp.uint8)
    capacity = engine.choose_capacity(n)

    t0 = time.time()
    out = engine.msm_jit(
        points, digits, signs,
        num_outputs=NUM_OUTPUTS, num_windows=NBYTES, capacity=capacity,
    )
    jax.block_until_ready(out.x)
    t_compile = time.time() - t0

    times = []
    for _ in range(SAMPLES):
        t0 = time.time()
        out = engine.msm_jit(
            points, digits, signs,
            num_outputs=NUM_OUTPUTS, num_windows=NBYTES, capacity=capacity,
        )
        jax.block_until_ready(out.x)
        times.append(time.time() - t0)

    best = min(times)
    pps = n * NUM_OUTPUTS / best
    baseline = os.environ.get("BLITZAR_TPU_BASELINE_PPS")
    vs = (pps / float(baseline)) if baseline else None
    print(
        json.dumps(
            {
                "metric": f"ristretto_pedersen_msm_2^{LOG_N}_points_per_sec",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": vs,
                "detail": {
                    "n": n,
                    "num_outputs": NUM_OUTPUTS,
                    "element_nbytes": NBYTES,
                    "best_s": round(best, 4),
                    "all_s": [round(t, 4) for t in times],
                    "compile_and_first_run_s": round(t_compile, 2),
                    "generator_precompute_s": round(t_gen, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

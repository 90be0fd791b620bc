"""Instrument fixed-MSM handle setup on the live device: generator
derivation, build compile, build run, split times — to locate the setup_s
bottleneck flagged in VERDICT (weak #1)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from blitzar_tpu.utils.cache import configure

configure(jax.config, tag="bench")

import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.msm import fixed

LOG_N = int(os.environ.get("PROBE_LOG_N", "20"))
W = int(os.environ.get("PROBE_WINDOW", "8"))


def t(label, f):
    t0 = time.time()
    r = f()
    jax.block_until_ready(r)
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s", flush=True)
    return r


n = 1 << LOG_N
print(f"device={jax.devices()[0]} n=2^{LOG_N} w={W}", flush=True)
points = t("generators", lambda: gen.ristretto_generators(n))
# two build calls: first includes compile, second is steady-state
split1 = t("build(compile+run)", lambda: fixed._build_split_table(points, W, ed))
del split1
split2 = t("build(run)", lambda: fixed._build_split_table(points, W, ed))
print("table shape:", split2.shape, split2.dtype, flush=True)

"""Break down fixed-MSM handle setup time on the real TPU.

Times (1) generator derivation, (2) build-kernel compile, (3) build-kernel
execution separately so we know where BENCH r02's setup_s=361 goes.
Usage: python tools/tpu_setup_probe.py [log_n] [window]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from blitzar_tpu.utils.cache import configure as _configure_cache

_configure_cache(jax.config, tag="bench")

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.msm import fixed
from blitzar_tpu.ops import pallas_point as pp

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    n = 1 << LOG_N
    print("device:", jax.devices()[0], flush=True)

    t0 = time.time()
    pts = gen.ristretto_generators(n)
    np.asarray(pts.x[:1, :1])
    t_gen = time.time() - t0
    print(f"gen_s {t_gen:.1f}", flush=True)

    groups = n // W
    gc = fixed._table_chunk_groups(groups)
    assert gc % pp._build_bg(W) == 0

    t0 = time.time()
    compiled = fixed._build_split_pallas.lower(
        pts, window_width=W, curve=ed, form="niels", gc=gc
    ).compile()
    t_comp = time.time() - t0
    print(f"build_compile_s {t_comp:.1f}", flush=True)

    t0 = time.time()
    out = compiled(pts)
    np.asarray(out[:1, :1, :1, :1])
    t_run = time.time() - t0
    print(f"build_run_s {t_run:.1f}", flush=True)

    # second run: steady-state (allocator warm)
    t0 = time.time()
    out2 = compiled(pts)
    np.asarray(out2[:1, :1, :1, :1])
    print(f"build_run2_s {time.time() - t0:.1f}", flush=True)


if __name__ == "__main__":
    main()

"""Break down fixed-MSM handle setup time on the real TPU.

Times each stage of MultiexpHandle construction separately so BENCH setup_s
is attributable: (1) generator acquisition — reporting whether the disk
cache was hit, and optionally the cold device-derivation cost, (2) the
partition-table build, timed on the SAME branch production
_build_split_table would dispatch to (fused Pallas / unfused Pallas / XLA
fallback), compile and run split out.

Usage: python tools/tpu_setup_probe.py [log_n] [window]
Env: PROBE_COLD_GEN=1 also times device derivation with the cache bypassed.
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


def _sync(x):
    np.asarray(x)


def main():
    n = 1 << LOG_N
    print("device:", jax.devices()[0], flush=True)

    # -- stage 1: generators ------------------------------------------------
    disk_hit = gen._disk_load(n) is not None
    print(f"gen_disk_cache_hit {disk_hit}", flush=True)
    t0 = time.time()
    pts = gen.ristretto_generators(n)
    _sync(pts.x[:1, :1])
    t_gen = time.time() - t0
    print(f"gen_s {t_gen:.1f} (disk_hit={disk_hit})", flush=True)

    if os.environ.get("PROBE_COLD_GEN"):
        t0 = time.time()
        cold = gen._generators_device(0, n)
        _sync(cold.x[:1, :1])
        print(f"gen_device_cold_s {time.time() - t0:.1f}", flush=True)
        del cold

    # -- stage 2: table build, on the branch production would take ----------
    groups = n // W
    gc = fixed._table_chunk_groups(groups)
    use_pallas = pp.use_pallas() and pp.build_split_fits(groups, W)
    if use_pallas and gc % pp._build_bg(W) == 0:
        branch = "pallas_chunked"
        lowered = fixed._build_split_pallas.lower(
            pts, window_width=W, curve=ed, form="niels", gc=gc
        )
    elif use_pallas:
        branch = "pallas_whole"
        coords = [c.reshape(ed.nlimbs, -1, W) for c in pts]
        lowered = pp._build_split_tiled.lower(
            coords, ed, W, "niels", fixed._table_dtype(), False
        )
    else:
        branch = "xla_fallback"
        lowered = fixed._build_split_table_xla.lower(
            pts, window_width=W, curve=ed, form="niels"
        )
    print(f"build_branch {branch}", flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    t_comp = time.time() - t0
    print(f"build_compile_s {t_comp:.1f}", flush=True)

    def run_once():
        t0 = time.time()
        if branch == "pallas_chunked":
            out = compiled(pts)
            _sync(out[:1, :1, :1, :1])
        elif branch == "pallas_whole":
            out = compiled([c.reshape(ed.nlimbs, -1, W) for c in pts])
            _sync(out[:1, :1, :1])
        else:
            out = compiled(pts)
            _sync(out[:1, :1, :1, :1])
        return time.time() - t0

    print(f"build_run_s {run_once():.1f}", flush=True)
    print(f"build_run2_s {run_once():.1f}", flush=True)

    # -- stage 3: end-to-end handle (what bench.py times as setup_s) --------
    t0 = time.time()
    handle = fixed.MultiexpHandle(pts, window_width=W)
    _sync(handle.t_split[:1, :1, :1])
    print(f"handle_total_s {time.time() - t0:.1f}", flush=True)


if __name__ == "__main__":
    main()

"""Offline precompute CLI: generate and write partition-table files.

Mirrors reference app/blitzar/main.cc (writes partition-table files for a
given curve and n, used for deployment precompute).

Usage:
    python -m blitzar_tpu.cli partition-table --curve ristretto255 \
        --n 1024 --out tables/rist1024 [--window-width 8]

For non-ristretto curves the generators must be supplied as an .npz file with
coord0..coordK limb arrays (the same layout MultiexpHandle serializes).
"""

from __future__ import annotations

import argparse
import sys

CURVE_NAMES = {
    "ristretto255": 0,
    "curve25519": 0,
    "bls12-381": 1,
    "bn254": 2,
    "grumpkin": 3,
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="blitzar_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    pt = sub.add_parser("partition-table", help="precompute a fixed-MSM handle file")
    pt.add_argument("--curve", default="ristretto255", choices=sorted(CURVE_NAMES))
    pt.add_argument("--n", type=int, required=True)
    pt.add_argument("--out", required=True)
    pt.add_argument("--window-width", type=int, default=None)
    pt.add_argument(
        "--generators",
        default=None,
        help=".npz with coord0..K arrays; defaults to the canonical ristretto set",
    )
    pt.add_argument(
        "--format",
        default="npz",
        choices=["npz", "reference"],
        help="'reference' writes the upstream raw compact_element format "
        "(in_memory_partition_table_accessor.h), loadable by the reference",
    )
    rp = sub.add_parser(
        "replay",
        help="re-run a BLITZAR_TPU_DUMP_DIR recording and check the result",
    )
    rp.add_argument("dirs", nargs="+", help="dump directories (name-NNN)")
    args = parser.parse_args(argv)

    if args.cmd == "replay":
        from .utils import recorder

        failed = 0
        for d in args.dirs:
            name, ok = recorder.replay_run(d)
            print(f"{name}: {'OK' if ok else 'MISMATCH'}")
            failed += not ok
        return 1 if failed else 0

    import jax.numpy as jnp
    import numpy as np

    from . import api
    from .msm import fixed

    curve_id = CURVE_NAMES[args.curve]
    curve = api.CURVES[curve_id]
    if args.generators is not None:
        data = np.load(args.generators)
        points = curve.make_point(
            *(jnp.asarray(data[f"coord{i}"]) for i in range(curve.coord_count))
        )
    else:
        if curve_id != 0:
            print("non-ristretto curves need --generators", file=sys.stderr)
            return 2
        from . import generators as gen

        points = gen.ristretto_generators(args.n)
    handle = fixed.MultiexpHandle(
        points, window_width=args.window_width, curve=curve, n=args.n
    )
    if args.format == "reference":
        from .msm import interop

        interop.write_reference_file(handle, args.out)
    else:
        handle.write_to_file(args.out)
    print(f"wrote {args.out} (curve={args.curve}, n={args.n}, w={handle.window_width})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

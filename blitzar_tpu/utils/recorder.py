"""Computation dump/replay recorder.

Mirrors reference sxt/base/system/directory_recorder.cc:28-50 +
multiexp/pippenger2/multiexponentiation_serialization.h:39-93: when
``BLITZAR_TPU_DUMP_DIR`` is set, each recorded computation writes its inputs
and result to ``$BLITZAR_TPU_DUMP_DIR/<name>-<counter>/`` for offline repro.
"""

from __future__ import annotations

import os
import threading

import numpy as np

_COUNTERS: dict[str, int] = {}
_LOCK = threading.Lock()

ENV_VAR = "BLITZAR_TPU_DUMP_DIR"


def dump_dir() -> str | None:
    return os.environ.get(ENV_VAR)


def new_record_dir(name: str) -> str | None:
    """Next numbered dump directory for `name`, or None if dumping is off."""
    base = dump_dir()
    if not base:
        return None
    with _LOCK:
        counter = _COUNTERS.get(name, 0)
        _COUNTERS[name] = counter + 1
    path = os.path.join(base, f"{name}-{counter:03d}")
    os.makedirs(path, exist_ok=True)
    return path


def write_arrays(path: str, **arrays) -> None:
    """Write named arrays to an existing dump dir."""
    np.savez(os.path.join(path, "data.npz"), **{
        k: np.asarray(v) for k, v in arrays.items() if v is not None
    })


def record(name: str, **arrays) -> str | None:
    """Write named arrays to the next dump dir; returns the dir or None."""
    path = new_record_dir(name)
    if path is None:
        return None
    write_arrays(path, **arrays)
    return path


def replay(path: str) -> dict:
    """Load a recorded computation's arrays."""
    return dict(np.load(os.path.join(path, "data.npz"), allow_pickle=False))


def replay_run(path: str):
    """Re-execute a recorded packed/vlen fixed-MSM dump and compare against
    the stored result. Returns (name, ok). The dump dir layout is
    ``data.npz`` (inputs + result coords) + ``accessor.npz`` (the handle),
    written by msm/fixed.py's _record_with_result."""
    import jax.numpy as jnp

    from ..msm import fixed

    name = os.path.basename(os.path.normpath(path))
    data = replay(path)
    kind, curve_name = name.rsplit("-", 1)[0].split("-", 1)
    from .. import api

    curve = next(c for c in api.CURVES.values() if c.name == curve_name)
    handle = fixed.MultiexpHandle.new_from_file(
        os.path.join(path, "accessor.npz"), curve=curve
    )
    bit_table = [int(b) for b in data["output_bit_table"]]
    if kind == "packed":
        result = fixed.fixed_packed_multiexponentiation(
            handle, bit_table, int(data["n"]), data["scalars"]
        )
    elif kind == "vlen":
        result = fixed.fixed_vlen_multiexponentiation(
            handle, bit_table, [int(v) for v in data["output_lengths"]], data["scalars"]
        )
    else:
        raise ValueError(f"unknown recording kind {kind!r} in {path}")
    ok = all(
        (np.asarray(c) == data[f"result{i}"]).all()
        for i, c in enumerate(result)
    )
    return name, bool(ok)

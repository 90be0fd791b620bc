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


def record(name: str, **arrays) -> str | None:
    """Write named arrays to the next dump dir; returns the dir or None."""
    path = new_record_dir(name)
    if path is None:
        return None
    np.savez(os.path.join(path, "data.npz"), **{
        k: np.asarray(v) for k, v in arrays.items() if v is not None
    })
    return path


def replay(path: str) -> dict:
    """Load a recorded computation's arrays."""
    return dict(np.load(os.path.join(path, "data.npz"), allow_pickle=False))

"""Public API mirroring the reference C ABI (reference cbindings/blitzar_api.h).

Entry points correspond 1:1 to the ``sxt_*`` functions; types are numpy arrays
and ``PointP3`` batches instead of C structs. Backend semantics follow the
reference: ``init`` is one-shot, the backend may be overridden by the
``BLITZAR_TPU_BACKEND`` env var, and generators fall back to the canonical
precomputed set when not supplied (reference cbindings/backend.cc,
pedersen.cc).
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import numpy as np

from . import generators as _gen
from .curves import edwards25519 as ed
from .curves import ristretto as rst
from .msm import engine as _engine
from .msm import sharded as _sharded

log = logging.getLogger("blitzar_tpu")
_level = os.environ.get("BLITZAR_TPU_LOG_LEVEL", "error").upper()
log.setLevel(getattr(logging, _level, logging.ERROR))


@dataclasses.dataclass
class SequenceDescriptor:
    """Mirror of sxt_sequence_descriptor (reference blitzar_api.h:115-136)."""

    element_nbytes: int
    n: int
    data: np.ndarray  # (n * element_nbytes,) or (n, element_nbytes) uint8 LE
    is_signed: bool = False

    def rows(self) -> np.ndarray:
        d = np.asarray(self.data, dtype=np.uint8).reshape(self.n, self.element_nbytes)
        return d


class _Backend:
    def __init__(self):
        self.initialized = False
        self.kind = "tpu"
        self.mesh = None

    def reset(self):
        self.initialized = False
        self.mesh = None
        _gen.CACHE.reset()


_BACKEND = _Backend()


def init(backend: str = "auto", num_precomputed_generators: int = 0, mesh=None):
    """One-shot library init (reference sxt_init, cbindings/backend.cc:112-127).

    backend: "auto" | "tpu" | "cpu". The BLITZAR_TPU_BACKEND env var overrides
    (reference backend.cc:70-90). cpu simply means: run the same programs on
    the host platform — results are bit-identical by construction.
    mesh: optional jax Mesh; when given (or when multiple devices are
    available) MSMs shard the point axis across it.
    """
    if _BACKEND.initialized:
        raise RuntimeError("init may only be called once (reference backend.cc:116)")
    env = os.environ.get("BLITZAR_TPU_BACKEND")
    if env:
        backend = env
    if backend == "auto":
        backend = "cpu" if jax.default_backend() == "cpu" else "tpu"
    if backend not in ("cpu", "tpu", "gpu"):
        raise ValueError(f"unknown backend {backend!r}")
    _BACKEND.kind = backend
    if mesh is not None:
        _BACKEND.mesh = mesh
    elif len(jax.devices()) > 1:
        _BACKEND.mesh = _sharded.make_mesh()
    _BACKEND.initialized = True
    if num_precomputed_generators:
        _gen.init_precomputed_generators(int(num_precomputed_generators))
    log.info("initialized backend=%s devices=%d", backend, len(jax.devices()))


def reset_backend_for_testing():
    """Reference cbindings/backend.cc:106-108 test hook."""
    _BACKEND.reset()


def _ensure_init():
    if not _BACKEND.initialized:
        init()


# ---------------------------------------------------------------------------
# Generators / one commitments
# ---------------------------------------------------------------------------


def get_ristretto255_generators(n: int, offset: int = 0) -> ed.PointP3:
    """Reference sxt_ristretto255_get_generators (blitzar_api.h:440)."""
    _ensure_init()
    return _gen.get_precomputed_generators(n, offset)


def get_curve25519_one_commit(n: int) -> ed.PointP3:
    """Reference sxt_curve25519_get_one_commit (blitzar_api.h:477)."""
    _ensure_init()
    return _gen.one_commitment(n)


def compress_ristretto255(points: ed.PointP3) -> np.ndarray:
    """(n,) point batch -> (n, 32) uint8 canonical encodings."""
    raw = np.asarray(rst.encode(points))
    return raw.T.copy()


def decompress_ristretto255(data: np.ndarray):
    """(n, 32) uint8 -> (PointP3, valid bool array)."""
    import jax.numpy as jnp

    pts, valid = rst.decode(jnp.asarray(np.asarray(data, np.uint8).T))
    return pts, np.asarray(valid)


# ---------------------------------------------------------------------------
# Pedersen commitments
# ---------------------------------------------------------------------------


def compute_curve25519_commitments(
    descriptors, generators: ed.PointP3 | None = None, generators_offset: int = 0
) -> np.ndarray:
    """Pedersen commitments over ristretto255 -> (num_sequences, 32) uint8.

    Mirrors sxt_curve25519_compute_pedersen_commitments[_with_generators]
    (reference blitzar_api.h:243-286, cbindings/pedersen.cc:44-104).
    """
    _ensure_init()
    descriptors = list(descriptors)
    if not descriptors:
        return np.zeros((0, 32), dtype=np.uint8)
    n_max = max(d.n for d in descriptors)
    if generators is None:
        generators = _gen.get_precomputed_generators(n_max, generators_offset)
    data_list = [d.rows() for d in descriptors]
    nbytes_list = [d.element_nbytes for d in descriptors]
    signed_list = [bool(d.is_signed) for d in descriptors]
    if _BACKEND.mesh is not None and _BACKEND.mesh.size > 1:
        result = _sharded.msm(_BACKEND.mesh, generators, data_list, nbytes_list, signed_list)
    else:
        result = _engine.msm(generators, data_list, nbytes_list, signed_list)
    return compress_ristretto255(result)

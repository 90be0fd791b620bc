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
from .curves import weierstrass as wc
from .msm import engine as _engine
from .msm import fixed as _fixed
from .msm import sharded as _sharded

# curve ids (reference blitzar_api.h:28-31)
SXT_CURVE_RISTRETTO255 = 0
SXT_CURVE_BLS_381 = 1
SXT_CURVE_BN_254 = 2
SXT_CURVE_GRUMPKIN = 3
# field ids (reference blitzar_api.h:33-34)
SXT_FIELD_SCALAR255 = 0
SXT_FIELD_GRUMPKIN = 1

CURVES = {
    SXT_CURVE_RISTRETTO255: ed,
    SXT_CURVE_BLS_381: wc.BLS12381_G1,
    SXT_CURVE_BN_254: wc.BN254_G1,
    SXT_CURVE_GRUMPKIN: wc.GRUMPKIN,
}

log = logging.getLogger("blitzar_tpu")
_level = os.environ.get("BLITZAR_TPU_LOG_LEVEL", "error").upper()
log.setLevel(getattr(logging, _level, logging.ERROR))


def _enable_compile_cache():
    """Point jax at a persistent compilation cache unless the host already
    configured one. The limb-arithmetic programs are large (minutes of XLA
    compile per curve); the cache is the cross-process analog of the
    reference's PTX-JIT warm-up (gpu_backend.cc:80-101). Opt out with
    BLITZAR_TPU_COMPILE_CACHE="" (empty)."""
    from .utils.cache import jax_cache_dir

    cache_dir = os.environ.get("BLITZAR_TPU_COMPILE_CACHE", jax_cache_dir())
    if cache_dir and jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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
        # undo a cpu-backend device pin so a later init("auto"/"tpu") in the
        # same process dispatches to the accelerator again
        if jax.config.jax_default_device is not None:
            jax.config.update("jax_default_device", None)
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
    _enable_compile_cache()
    _BACKEND.kind = backend
    if backend == "cpu" and jax.default_backend() != "cpu":
        # honor the cpu backend on an accelerator host: route dispatch to the
        # host platform (results are bit-identical by construction — the
        # reference's cpu backend exists for exactly this, SURVEY §0). The
        # device kernels check jax.default_backend() so the Pallas fast
        # paths stay off.
        try:
            jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            log.warning("cpu backend requested but no host cpu platform available")
    if mesh is not None:
        _BACKEND.mesh = mesh
    elif backend != "cpu" and len(jax.devices()) > 1:
        # cpu backend on an accelerator host: skip mesh auto-creation so the
        # sharded MSM paths don't silently dispatch to the accelerator chips
        _BACKEND.mesh = _sharded.make_mesh()
    _BACKEND.initialized = True
    if num_precomputed_generators:
        _gen.init_precomputed_generators(int(num_precomputed_generators))
    if os.environ.get("BLITZAR_TPU_WARMUP"):
        # eager-compile the hot MSM programs with a tiny problem, so the
        # first real call doesn't pay minutes of XLA compilation (the analog
        # of the reference's PTX-JIT warm-up dummy MSM at init,
        # gpu_backend.cc:80-101). Pair with jax's persistent compilation
        # cache (jax_compilation_cache_dir) to amortize across processes.
        dummy = np.ones((1, 1), np.uint8)
        _engine.msm(_gen.ristretto_generators(8), [dummy], [1], [False])
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


def _checks_enabled() -> bool:
    """BLITZAR_TPU_CHECKS=1 turns on runtime result validation (on-curve
    checks after every MSM) — the sanitizer-equivalent test mode (the
    reference runs its suite under ASAN and compute-sanitizer,
    .bazelrc:30-60, tools/cuda/compute_sanitizer_wrapper.sh; tools/ci.sh
    runs a pass with this set)."""
    return os.environ.get("BLITZAR_TPU_CHECKS", "") not in ("", "0")


def _validate_descriptors(descriptors):
    """Reference release asserts (cbindings/pedersen.cc:44-69) plus the
    documented signed-width contract (multiexp/base/exponent_sequence.h:40:
    if signed, element_nbytes must be <= 16)."""
    for d in descriptors:
        if not 1 <= int(d.element_nbytes) <= 32:
            raise ValueError(
                f"element_nbytes must be in [1, 32], got {d.element_nbytes}"
            )
        if d.is_signed and int(d.element_nbytes) > 16:
            raise ValueError(
                "signed sequences require element_nbytes <= 16 "
                f"(got {d.element_nbytes})"
            )
        if int(d.n) > 0 and d.data is None:
            raise ValueError("nonempty sequence with null data")


def _check_result(curve, result):
    if _checks_enabled():
        ok = np.asarray(curve.is_on_curve(result))
        if not ok.all():
            raise RuntimeError(
                f"MSM result off curve at outputs {np.nonzero(~ok)[0]}"
            )


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
    _validate_descriptors(descriptors)
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
    _check_result(ed, result)
    return compress_ristretto255(result)


def _generic_commitments(descriptors, generators, curve):
    _ensure_init()
    descriptors = list(descriptors)
    if not descriptors:
        return curve.identity((0,))
    _validate_descriptors(descriptors)
    data_list = [d.rows() for d in descriptors]
    nbytes_list = [d.element_nbytes for d in descriptors]
    signed_list = [bool(d.is_signed) for d in descriptors]
    if _BACKEND.mesh is not None and _BACKEND.mesh.size > 1:
        result = _sharded.msm(
            _BACKEND.mesh, generators, data_list, nbytes_list, signed_list, curve=curve
        )
    else:
        result = _engine.msm(generators, data_list, nbytes_list, signed_list, curve=curve)
    _check_result(curve, result)
    return result


def _affine_struct(curve, points):
    """Batched projective -> structured array mirroring the reference's
    uncompressed affine output structs (sxt_bn254_g1 / sxt_grumpkin,
    blitzar_api.h:87-106): Montgomery x/y limb bytes + infinity flag; the
    identity maps to x = y = 0 with infinity set."""
    x_mont, y_mont, inf = curve.to_affine(points)
    F = curve.field
    inf_np = np.asarray(inf)
    # identity: zero out x/y (to_affine already yields 0 via inv(0) = 0)
    out = np.zeros(
        inf_np.shape[0],
        dtype=[("x", np.uint8, F.nbytes), ("y", np.uint8, F.nbytes), ("infinity", np.uint8)],
    )
    out["x"] = np.asarray(F.to_bytes_le(x_mont)).T
    out["y"] = np.asarray(F.to_bytes_le(y_mont)).T
    out["infinity"] = inf_np.astype(np.uint8)
    out["x"][inf_np] = 0
    out["y"][inf_np] = 0
    return out


def compute_bls12_381_g1_commitments_with_generators(descriptors, generators) -> np.ndarray:
    """-> (num_sequences, 48) uint8 zcash-compressed G1 (reference
    sxt_bls12_381_g1_compute_pedersen_commitments_with_generators,
    blitzar_api.h:324)."""
    result = _generic_commitments(descriptors, generators, wc.BLS12381_G1)
    return wc.compress_bls12_381(result)


def compute_bn254_g1_uncompressed_commitments_with_generators(descriptors, generators):
    """-> structured (x, y, infinity) affine array (reference
    sxt_bn254_g1_uncompressed_compute_pedersen_commitments_with_generators,
    blitzar_api.h:364)."""
    result = _generic_commitments(descriptors, generators, wc.BN254_G1)
    return _affine_struct(wc.BN254_G1, result)


def compute_grumpkin_uncompressed_commitments_with_generators(descriptors, generators):
    """Reference blitzar_api.h:404."""
    result = _generic_commitments(descriptors, generators, wc.GRUMPKIN)
    return _affine_struct(wc.GRUMPKIN, result)


# ---------------------------------------------------------------------------
# fixed-generator multiexponentiation handles (reference blitzar_api.h:631-752)
# ---------------------------------------------------------------------------


def multiexp_handle_new(curve_id: int, generators, n: int | None = None):
    """Reference sxt_multiexp_handle_new (blitzar_api.h:631)."""
    _ensure_init()
    return _fixed.MultiexpHandle(generators, curve=CURVES[curve_id], n=n)


def multiexp_handle_new_from_file(curve_id: int, filename: str):
    """Reference sxt_multiexp_handle_new_from_file (blitzar_api.h:641)."""
    _ensure_init()
    return _fixed.MultiexpHandle.new_from_file(filename, curve=CURVES[curve_id])


def multiexp_handle_write_to_file(handle, filename: str) -> None:
    """Reference sxt_multiexp_handle_write_to_file (blitzar_api.h:649)."""
    handle.write_to_file(filename)


def fixed_multiexponentiation(handle, scalars):
    """Reference sxt_fixed_multiexponentiation (blitzar_api.h:685).
    scalars: (num_outputs, n, element_num_bytes) uint8. Returns a point batch
    of the handle's curve."""
    _ensure_init()
    return _fixed.fixed_multiexponentiation(handle, scalars)


def fixed_packed_multiexponentiation(handle, output_bit_table, n: int, scalars):
    """Reference sxt_fixed_packed_multiexponentiation (blitzar_api.h:712)."""
    _ensure_init()
    return _fixed.fixed_packed_multiexponentiation(handle, output_bit_table, n, scalars)


def fixed_vlen_multiexponentiation(handle, output_bit_table, output_lengths, scalars):
    """Reference sxt_fixed_vlen_multiexponentiation (blitzar_api.h:741)."""
    _ensure_init()
    return _fixed.fixed_vlen_multiexponentiation(
        handle, output_bit_table, output_lengths, scalars
    )


# ---------------------------------------------------------------------------
# inner-product argument (reference blitzar_api.h:566-631)
# ---------------------------------------------------------------------------


def prove_inner_product(transcript, n: int, generators_offset: int, a_vector, b_vector):
    """Reference sxt_curve25519_prove_inner_product (blitzar_api.h:566):
    G = precomputed generators[offset .. offset+np], Q = generators[offset+np].
    Returns (l_vector (rounds, 32), r_vector (rounds, 32), ap_value int)."""
    _ensure_init()
    from .proof import inner_product as _ipa

    np_ = 1 << _ipa.ceil_log2(n)
    g_vector = _gen.get_precomputed_generators(np_, generators_offset)
    q_value = _gen.get_precomputed_generators(1, generators_offset + np_)
    return _ipa.prove_inner_product(transcript, a_vector, b_vector, g_vector, q_value)


def verify_inner_product(
    transcript, n: int, generators_offset: int, b_vector, product, a_commit,
    l_vector, r_vector, ap_value,
) -> bool:
    """Reference sxt_curve25519_verify_inner_product (blitzar_api.h:611)."""
    _ensure_init()
    from .proof import inner_product as _ipa

    np_ = 1 << _ipa.ceil_log2(n)
    g_vector = _gen.get_precomputed_generators(np_, generators_offset)
    q_value = _gen.get_precomputed_generators(1, generators_offset + np_)
    return _ipa.verify_inner_product(
        transcript, b_vector, product, a_commit, l_vector, r_vector, ap_value,
        g_vector, q_value,
    )


# ---------------------------------------------------------------------------
# sumcheck (reference blitzar_api.h:766)
# ---------------------------------------------------------------------------


def prove_sumcheck(
    field_id: int, mles, product_table, product_terms, n: int, transcript=None,
    challenge_callback=None,
):
    """Reference sxt_prove_sumcheck (blitzar_api.h:766). Either pass a Merlin
    `transcript` (reference_transcript semantics) or a `challenge_callback`
    (the C callback flavor). Returns (round_polynomials, evaluation_point)."""
    _ensure_init()
    from .proof import sumcheck as _sc

    codec = (
        _sc.SCALAR25519_CODEC if field_id == SXT_FIELD_SCALAR255 else _sc.FIELDGK_CODEC
    )
    if challenge_callback is not None:
        tr = _sc.CallbackSumcheckTranscript(challenge_callback)
    else:
        tr = _sc.ReferenceSumcheckTranscript(transcript, codec)
    return _sc.prove_sum(tr, mles, product_table, product_terms, n, codec)

"""In-process bridge backing the native C ABI (cbindings/).

The C shim (cbindings/capi.cc) embeds CPython and forwards every ``sxt_*``
call here as raw pointer values (uintptr ints) plus sizes; this module does
the reference-ABI struct parsing with ctypes and calls the Python API. The
struct layouts mirror reference cbindings/blitzar_api.h exactly:

  sxt_sequence_descriptor   {u8 element_nbytes; u64 n; const u8* data;
                             int is_signed}                  (40.. packed @ 32)
  sxt_ristretto255          {u64 X[5],Y[5],Z[5],T[5]}  field51 radix-2^51 limbs
  sxt_bls12_381_g1_p2       {u64 X[6],Y[6],Z[6]}       Montgomery, R = 2^384
  sxt_bn254_g1_p2 / _grumpkin_p2 {u64 X[4],Y[4],Z[4]}  Montgomery, R = 2^256
  sxt_bn254_g1 / sxt_grumpkin    {u64 X[4],Y[4]; u8 infinity} (72 bytes)
  sxt_transcript            203 bytes (keccak state + pos/pos_begin/flags)
"""

from __future__ import annotations

import ctypes
import struct

import jax.numpy as jnp
import numpy as np

from . import api

# the embedded interpreter starts with a virgin jax config: point it at the
# persistent compilation cache up front so every native consumer process
# amortizes the minutes-long XLA compiles (api.init also does this, but the
# bridge may service getter calls before sxt_init-driven jit use)
api._enable_compile_cache()
from . import generators as _gen
from .curves import edwards25519 as ed
from .curves import weierstrass as wc
from .fields import fp25519 as F51
from .msm import fixed as _fixed
from .proof import sumcheck as _sc
from .proof.transcript import Transcript

P25519 = 2**255 - 19

# ---------------------------------------------------------------------------
# low-level memory helpers
# ---------------------------------------------------------------------------


def _read(addr: int, size: int) -> bytes:
    return ctypes.string_at(addr, size)


def _write(addr: int, data: bytes) -> None:
    ctypes.memmove(addr, data, len(data))


# ---------------------------------------------------------------------------
# element conversions (reference ABI representations <-> canonical ints)
# ---------------------------------------------------------------------------


def _f51_to_int(limbs: tuple[int, ...]) -> int:
    return sum(v << (51 * i) for i, v in enumerate(limbs)) % P25519


def _int_to_f51(v: int) -> list[int]:
    return [(v >> (51 * i)) & ((1 << 51) - 1) for i in range(5)]


def _parse_ristretto255_points(addr: int, n: int) -> ed.PointP3:
    """n sxt_ristretto255 (160 bytes each) -> PointP3 batch (vectorized
    radix-51 -> radix-16 conversion, utils/limbs.py)."""
    from .utils import limbs as _limbs

    raw = np.frombuffer(_read(addr, 160 * n), dtype="<u8").reshape(n, 4, 5)
    return ed.PointP3(
        *(jnp.asarray(_limbs.f51_u64_to_limbs16(raw[:, c])) for c in range(4))
    )


def _emit_ristretto255_points(points: ed.PointP3) -> bytes:
    """PointP3 batch -> packed sxt_ristretto255 array bytes (vectorized)."""
    from .utils import limbs as _limbs

    coords = [_limbs.limbs16_to_f51_u64(np.asarray(c)) for c in points]
    return np.stack(coords, axis=1).astype("<u8").tobytes()  # (n, 4, 5)


def _parse_mont_p2_points(addr: int, n: int, curve) -> wc.PointP2:
    """n {X,Y,Z} Montgomery-u64-limb projective structs -> PointP2 batch.

    The ABI structs and MontField both hold Montgomery residues, so parsing
    is a pure limb-width reinterpretation (no modmul)."""
    from .utils import limbs as _limbs

    f = curve.field
    nl64 = f.nbytes // 8
    raw = np.frombuffer(_read(addr, 3 * nl64 * 8 * n), dtype="<u8").reshape(n, 3, nl64)
    return wc.PointP2(
        *(jnp.asarray(_limbs.u64_to_limbs16(raw[:, c])) for c in range(3))
    )


def _parse_mont_affine_points(addr: int, n: int, curve, has_infinity: bool) -> wc.PointP2:
    """n affine Montgomery-limb structs -> PointP2 batch (vectorized).

    bls12-381: {X[6], Y[6]} (96 bytes, reference blitzar_api.h:74-78);
    bn254/grumpkin: {X[4], Y[4], u8 infinity} padded to 72 bytes
    (blitzar_api.h:87-106)."""
    from .utils import limbs as _limbs

    f = curve.field
    nl64 = f.nbytes // 8
    stride = 2 * nl64 * 8 + (8 if has_infinity else 0)
    raw = np.frombuffer(_read(addr, stride * n), np.uint8).reshape(n, stride)
    xy = np.ascontiguousarray(raw[:, : 2 * nl64 * 8]).view("<u8").reshape(n, 2, nl64)
    x = _limbs.u64_to_limbs16(xy[:, 0])  # (nlimbs, n) Montgomery
    y = _limbs.u64_to_limbs16(xy[:, 1])
    one_mont = np.asarray(f._int_limbs(f.r))[:, None]
    z = np.broadcast_to(one_mont, x.shape).copy()
    if has_infinity:
        inf = raw[:, 2 * nl64 * 8] != 0  # (n,)
        x = np.where(inf[None, :], 0, x)
        y = np.where(inf[None, :], np.broadcast_to(one_mont, y.shape), y)
        z = np.where(inf[None, :], 0, z)
    return wc.PointP2(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


# ---------------------------------------------------------------------------
# descriptor parsing
# ---------------------------------------------------------------------------

_SEQ_DESC_SIZE = 32  # u8 + pad, u64 n, ptr, int is_signed + pad


def _parse_descriptors(addr: int, num: int) -> list[api.SequenceDescriptor]:
    out = []
    for i in range(num):
        blob = _read(addr + i * _SEQ_DESC_SIZE, _SEQ_DESC_SIZE)
        element_nbytes = blob[0]
        (n,) = struct.unpack_from("<Q", blob, 8)
        (data_ptr,) = struct.unpack_from("<Q", blob, 16)
        (is_signed,) = struct.unpack_from("<i", blob, 24)
        data = (
            np.frombuffer(_read(data_ptr, n * element_nbytes), np.uint8).copy()
            if n
            else np.zeros((0,), np.uint8)
        )
        out.append(
            api.SequenceDescriptor(int(element_nbytes), int(n), data, bool(is_signed))
        )
    return out


# ---------------------------------------------------------------------------
# entry points called from cbindings/capi.cc
# ---------------------------------------------------------------------------


def init(backend: int, num_precomputed_generators: int) -> int:
    # SXT_CPU_BACKEND=1, SXT_GPU_BACKEND=2 (reference blitzar_api.h:25-26).
    # The reference validates the value and returns 1 on anything else
    # (backend.cc:114-134); GPU maps to our accelerator path ("auto" picks
    # tpu when a chip is attached), CPU pins the host platform.
    kinds = {1: "cpu", 2: "auto"}
    if backend not in kinds:
        return 1
    try:
        api.init(
            backend=kinds[backend],
            num_precomputed_generators=num_precomputed_generators,
        )
        return 0
    except RuntimeError:
        return 1


def curve25519_compute_pedersen_commitments(
    res_addr: int, num_sequences: int, descriptors_addr: int,
    generators_addr: int, num_generators: int, offset: int,
) -> None:
    descriptors = _parse_descriptors(descriptors_addr, num_sequences)
    generators = (
        _parse_ristretto255_points(generators_addr, num_generators)
        if generators_addr
        else None
    )
    out = api.compute_curve25519_commitments(
        descriptors, generators, generators_offset=offset
    )
    _write(res_addr, out.tobytes())


def bls12_381_g1_compute_pedersen_commitments(
    res_addr: int, num_sequences: int, descriptors_addr: int,
    generators_addr: int, num_generators: int,
) -> None:
    descriptors = _parse_descriptors(descriptors_addr, num_sequences)
    generators = _parse_mont_affine_points(
        generators_addr, num_generators, wc.BLS12381_G1, has_infinity=False
    )
    out = api.compute_bls12_381_g1_commitments_with_generators(descriptors, generators)
    _write(res_addr, out.tobytes())


def _uncompressed_commitments(
    res_addr, num_sequences, descriptors_addr, generators_addr, num_generators, curve, fn
):
    descriptors = _parse_descriptors(descriptors_addr, num_sequences)
    generators = _parse_mont_affine_points(
        generators_addr, num_generators, curve, has_infinity=True
    )
    out = fn(descriptors, generators)
    f = curve.field
    rec = bytearray()
    for i in range(len(out)):
        if out["infinity"][i]:
            # reference convention: identity keeps x/y zero, infinity = 1
            rec += bytes(2 * f.nbytes) + b"\x01" + bytes(7)
        else:
            x = int.from_bytes(bytes(out["x"][i]), "little") * f.r % f.modulus
            y = int.from_bytes(bytes(out["y"][i]), "little") * f.r % f.modulus
            rec += x.to_bytes(f.nbytes, "little") + y.to_bytes(f.nbytes, "little")
            rec += b"\x00" + bytes(7)
    _write(res_addr, bytes(rec))


def bn254_g1_uncompressed_compute_pedersen_commitments(
    res_addr: int, num_sequences: int, descriptors_addr: int,
    generators_addr: int, num_generators: int,
) -> None:
    _uncompressed_commitments(
        res_addr, num_sequences, descriptors_addr, generators_addr, num_generators,
        wc.BN254_G1, api.compute_bn254_g1_uncompressed_commitments_with_generators,
    )


def grumpkin_uncompressed_compute_pedersen_commitments(
    res_addr: int, num_sequences: int, descriptors_addr: int,
    generators_addr: int, num_generators: int,
) -> None:
    _uncompressed_commitments(
        res_addr, num_sequences, descriptors_addr, generators_addr, num_generators,
        wc.GRUMPKIN, api.compute_grumpkin_uncompressed_commitments_with_generators,
    )


def ristretto255_get_generators(res_addr: int, offset: int, n: int) -> int:
    points = api.get_ristretto255_generators(n, offset)
    _write(res_addr, _emit_ristretto255_points(points))
    return 0


def curve25519_get_one_commit(res_addr: int, n: int) -> int:
    point = api.get_curve25519_one_commit(n)
    _write(res_addr, _emit_ristretto255_points(point))
    return 0


# -- inner product -----------------------------------------------------------


def _read_scalars(addr: int, n: int) -> np.ndarray:
    """(n, 32) uint8 LE rows — passed through to the prover without
    per-element Python int conversion."""
    return np.frombuffer(_read(addr, 32 * n), np.uint8).reshape(n, 32).copy()


def curve25519_prove_inner_product(
    l_addr: int, r_addr: int, ap_addr: int, transcript_addr: int,
    n: int, generators_offset: int, a_addr: int, b_addr: int,
) -> None:
    transcript = Transcript.from_bytes203(_read(transcript_addr, 203))
    a = _read_scalars(a_addr, n)
    b = _read_scalars(b_addr, n)
    l_vec, r_vec, ap = api.prove_inner_product(transcript, n, generators_offset, a, b)
    if len(l_vec):
        _write(l_addr, l_vec.tobytes())
        _write(r_addr, r_vec.tobytes())
    _write(ap_addr, ap.to_bytes(32, "little"))
    _write(transcript_addr, transcript.to_bytes203())


def curve25519_verify_inner_product(
    transcript_addr: int, n: int, generators_offset: int, b_addr: int,
    product_addr: int, a_commit_addr: int, l_addr: int, r_addr: int, ap_addr: int,
) -> int:
    transcript = Transcript.from_bytes203(_read(transcript_addr, 203))
    b = _read_scalars(b_addr, n)
    product = _read_scalars(product_addr, 1)[0]
    a_commit = _parse_ristretto255_points(a_commit_addr, 1)
    num_rounds = max(int(n - 1).bit_length(), 0)
    l_vec = np.frombuffer(_read(l_addr, 32 * num_rounds), np.uint8).reshape(-1, 32)
    r_vec = np.frombuffer(_read(r_addr, 32 * num_rounds), np.uint8).reshape(-1, 32)
    ap = _read_scalars(ap_addr, 1)[0]
    ok = api.verify_inner_product(
        transcript, n, generators_offset, b, product, a_commit, l_vec, r_vec, ap
    )
    _write(transcript_addr, transcript.to_bytes203())
    return 1 if ok else 0


# -- fixed multiexponentiation ------------------------------------------------

_HANDLES: dict[int, _fixed.MultiexpHandle] = {}
_NEXT_HANDLE = [1]


def _register(handle) -> int:
    hid = _NEXT_HANDLE[0]
    _NEXT_HANDLE[0] += 1
    _HANDLES[hid] = handle
    return hid


def multiexp_handle_new(curve_id: int, generators_addr: int, n: int) -> int:
    curve = api.CURVES[curve_id]
    if curve_id == api.SXT_CURVE_RISTRETTO255:
        points = _parse_ristretto255_points(generators_addr, n)
    else:
        points = _parse_mont_p2_points(generators_addr, n, curve)
    return _register(_fixed.MultiexpHandle(points, curve=curve, n=n))


def multiexp_handle_new_from_file(curve_id: int, filename: bytes) -> int:
    return _register(
        _fixed.MultiexpHandle.new_from_file(
            filename.decode(), curve=api.CURVES[curve_id]
        )
    )


def multiexp_handle_write_to_file(hid: int, filename: bytes) -> None:
    _HANDLES[hid].write_to_file(filename.decode())


def multiexp_handle_free(hid: int) -> None:
    _HANDLES.pop(hid, None)


def _emit_fixed_result(res_addr: int, handle, points) -> None:
    curve = handle.curve
    if curve is ed:
        _write(res_addr, _emit_ristretto255_points(points))
        return
    # projective Montgomery p2 structs: internal limbs are already Montgomery
    # residues, so emission is a pure limb-width reinterpretation
    from .utils import limbs as _limbs

    coords = [_limbs.limbs16_to_u64(np.asarray(c)) for c in points]
    _write(res_addr, np.stack(coords, axis=1).astype("<u8").tobytes())


def fixed_multiexponentiation(
    res_addr: int, hid: int, element_num_bytes: int, num_outputs: int,
    n: int, scalars_addr: int,
) -> None:
    handle = _HANDLES[hid]
    raw = np.frombuffer(
        _read(scalars_addr, num_outputs * n * element_num_bytes), np.uint8
    )
    # column-major (reference blitzar_api.h:663-676): generator-major layout
    scalars = raw.reshape(n, num_outputs, element_num_bytes).transpose(1, 0, 2)
    out = _fixed.fixed_multiexponentiation(handle, scalars)
    _emit_fixed_result(res_addr, handle, out)


def fixed_packed_multiexponentiation(
    res_addr: int, hid: int, bit_table_addr: int, num_outputs: int,
    n: int, scalars_addr: int,
) -> None:
    handle = _HANDLES[hid]
    bit_table = np.frombuffer(_read(bit_table_addr, 4 * num_outputs), "<u4")
    num_bytes = -(-int(bit_table.sum()) // 8)
    scalars = np.frombuffer(_read(scalars_addr, num_bytes * n), np.uint8)
    out = _fixed.fixed_packed_multiexponentiation(handle, bit_table, n, scalars)
    _emit_fixed_result(res_addr, handle, out)


def fixed_vlen_multiexponentiation(
    res_addr: int, hid: int, bit_table_addr: int, lengths_addr: int,
    num_outputs: int, scalars_addr: int,
) -> None:
    handle = _HANDLES[hid]
    bit_table = np.frombuffer(_read(bit_table_addr, 4 * num_outputs), "<u4")
    lengths = np.frombuffer(_read(lengths_addr, 4 * num_outputs), "<u4")
    n = int(lengths.max()) if num_outputs else 0
    num_bytes = -(-int(bit_table.sum()) // 8)
    scalars = np.frombuffer(_read(scalars_addr, num_bytes * n), np.uint8)
    out = _fixed.fixed_vlen_multiexponentiation(handle, bit_table, lengths, scalars)
    _emit_fixed_result(res_addr, handle, out)


# -- sumcheck ------------------------------------------------------------------

_SUMCHECK_CB = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint
)


def prove_sumcheck(
    polynomials_addr: int, evaluation_point_addr: int, field_id: int,
    mles_addr: int, product_table_addr: int, product_terms_addr: int,
    n: int, num_mles: int, num_products: int, num_product_terms: int,
    round_degree: int, callback_addr: int, context_addr: int,
) -> None:
    codec = (
        _sc.SCALAR25519_CODEC if field_id == api.SXT_FIELD_SCALAR255
        else _sc.FIELDGK_CODEC
    )
    f = codec.field
    rinv = pow(f.r, -1, f.modulus)

    def elem_from_bytes(b: bytes) -> int:
        v = int.from_bytes(b, "little")
        return v % f.modulus if field_id == api.SXT_FIELD_SCALAR255 else v * rinv % f.modulus

    def elem_to_bytes(v: int) -> bytes:
        if field_id != api.SXT_FIELD_SCALAR255:
            v = v * f.r % f.modulus
        return v.to_bytes(32, "little")

    # mles: n x num_mles column-major FIELD — passed through as byte rows
    # (prove_sum converts on device; scalar25519 bytes are standard-form,
    # fieldgk bytes are Montgomery residues, both handled by the codec)
    raw = _read(mles_addr, 32 * n * num_mles)
    mles = np.frombuffer(raw, np.uint8).reshape(num_mles, n, 32).copy()
    # product_table: {FIELD multiplier; unsigned product_length} -> 40 bytes
    traw = _read(product_table_addr, 40 * num_products)
    product_table = []
    for p in range(num_products):
        mult = elem_from_bytes(traw[40 * p : 40 * p + 32])
        (plen,) = struct.unpack_from("<I", traw, 40 * p + 32)
        product_table.append((mult, int(plen)))
    product_terms = list(
        np.frombuffer(_read(product_terms_addr, 4 * num_product_terms), "<u4")
    )

    cb = _SUMCHECK_CB(callback_addr)
    eval_images: list[bytes] = []

    def challenge(poly_ints: list[int]) -> int:
        buf = (ctypes.c_uint8 * (32 * len(poly_ints)))()
        flat = b"".join(elem_to_bytes(c) for c in poly_ints)
        ctypes.memmove(buf, flat, len(flat))
        r_buf = (ctypes.c_uint8 * 32)()
        cb(
            ctypes.cast(r_buf, ctypes.c_void_p),
            ctypes.c_void_p(context_addr),
            ctypes.cast(buf, ctypes.c_void_p),
            len(poly_ints),
        )
        raw_r = bytes(r_buf)
        eval_images.append(raw_r)
        return elem_from_bytes(raw_r)

    polys, _ = _sc.prove_sum(
        _sc.CallbackSumcheckTranscript(challenge),
        mles, product_table, product_terms, n, codec,
    )
    out = bytearray()
    for poly in polys:
        padded = poly + [0] * (round_degree + 1 - len(poly))
        for c in padded:
            out += elem_to_bytes(c)
    _write(polynomials_addr, bytes(out))
    _write(evaluation_point_addr, b"".join(eval_images))

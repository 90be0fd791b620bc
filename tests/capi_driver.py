"""Subprocess driver for the native C ABI tests: exercises libblitzar_tpu.so
via ctypes and prints CAPI_OK on success. Run in its own process because the
shim's panic() aborts (by design, mirroring the reference's panic-on-misuse),
which must not take the pytest process down."""

import ctypes
import sys

import numpy as np

sys.path.insert(0, sys.argv[2] if len(sys.argv) > 2 else ".")

from blitzar_tpu import api  # noqa: E402, F401
from blitzar_tpu.proof.transcript import Transcript  # noqa: E402
from blitzar_tpu.refimpl import core as refc  # noqa: E402

P = 2**255 - 19


class SequenceDescriptor(ctypes.Structure):
    _fields_ = [
        ("element_nbytes", ctypes.c_uint8),
        ("n", ctypes.c_uint64),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("is_signed", ctypes.c_int),
    ]


class Config(ctypes.Structure):
    _fields_ = [("backend", ctypes.c_int), ("num_precomputed_generators", ctypes.c_uint64)]


def main(lib_path: str) -> None:
    assert ctypes.sizeof(SequenceDescriptor) == 32
    lib = ctypes.CDLL(lib_path)
    api.reset_backend_for_testing()

    cfg = Config(1, 0)
    assert lib.sxt_init(ctypes.byref(cfg)) == 0

    # pedersen vs pinned oracle
    n, nbytes = 6, 4
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, size=(n * nbytes,), dtype=np.uint8)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data.tobytes())
    desc = (SequenceDescriptor * 1)(
        SequenceDescriptor(nbytes, n, ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)), 0)
    )
    out = (ctypes.c_uint8 * 32)()
    lib.sxt_curve25519_compute_pedersen_commitments(out, 1, desc, 0)
    scalars = [
        int.from_bytes(bytes(data[i * nbytes : (i + 1) * nbytes]), "little")
        for i in range(n)
    ]
    want = refc.ristretto_encode(refc.naive_msm(scalars, refc.get_generators(n)))
    assert bytes(out) == want, "pedersen mismatch"

    # generators roundtrip (affine comparison)
    gens_out = (ctypes.c_uint64 * (20 * 3))()
    assert lib.sxt_ristretto255_get_generators(gens_out, 0, 3) == 0
    gens_ref = refc.get_generators(3)
    for i in range(3):
        limbs = [int(gens_out[20 * i + j]) for j in range(20)]
        coords = [
            sum(v << (51 * k) for k, v in enumerate(limbs[5 * c : 5 * c + 5])) % P
            for c in range(4)
        ]
        x, y, z, t = coords
        zinv = pow(z, -1, P)
        rx, ry, rz, rt = gens_ref[i]
        rzinv = pow(rz, -1, P)
        assert (x * zinv % P, y * zinv % P) == (rx * rzinv % P, ry * rzinv % P), i

    # inner product prove + verify through the ABI
    n2 = 2
    a = [7, 11]
    b = [13, 17]

    def scalars_buf(vals):
        raw = b"".join(int(v).to_bytes(32, "little") for v in vals)
        return (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)

    l_vec = (ctypes.c_uint8 * 32)()
    r_vec = (ctypes.c_uint8 * 32)()
    ap = (ctypes.c_uint8 * 32)()
    transcript = (ctypes.c_uint8 * 203).from_buffer_copy(Transcript(b"abc").to_bytes203())
    lib.sxt_curve25519_prove_inner_product(
        l_vec, r_vec, ap, transcript, n2, 0, scalars_buf(a), scalars_buf(b)
    )
    a_commit_pt = refc.naive_msm(a, refc.get_generators(n2))
    raw = b"".join(
        b"".join(
            int((v >> (51 * k)) & ((1 << 51) - 1)).to_bytes(8, "little")
            for k in range(5)
        )
        for v in (c % P for c in a_commit_pt)
    )
    a_commit = (ctypes.c_uint8 * 160).from_buffer_copy(raw)
    product = sum(x * y for x, y in zip(a, b))
    transcript2 = (ctypes.c_uint8 * 203).from_buffer_copy(Transcript(b"abc").to_bytes203())
    ok = lib.sxt_curve25519_verify_inner_product(
        transcript2, n2, 0, scalars_buf(b), scalars_buf([product]), a_commit,
        l_vec, r_vec, ap,
    )
    assert ok == 1, "ipa verify failed"

    # fixed multiexponentiation through the handle ABI
    gens_struct = (ctypes.c_uint64 * (20 * 4))()
    assert lib.sxt_ristretto255_get_generators(gens_struct, 0, 4) == 0
    lib.sxt_multiexp_handle_new.restype = ctypes.c_void_p
    handle = lib.sxt_multiexp_handle_new(0, gens_struct, 4)
    # scalars: column-major (n x num_outputs), 2 bytes each
    vals = [[3, 5, 7, 9], [11, 13, 17, 19]]
    col = bytearray()
    for i in range(4):
        for o in range(2):
            col += int(vals[o][i]).to_bytes(2, "little")
    sc_buf = (ctypes.c_uint8 * len(col)).from_buffer_copy(bytes(col))
    res = (ctypes.c_uint64 * (20 * 2))()
    lib.sxt_fixed_multiexponentiation(
        res, ctypes.c_void_p(handle), 2, 2, 4, sc_buf
    )
    for o in range(2):
        limbs = [int(res[20 * o + j]) for j in range(20)]
        coords = [
            sum(v << (51 * k) for k, v in enumerate(limbs[5 * c : 5 * c + 5])) % P
            for c in range(4)
        ]
        x, y, z, t = coords
        zinv = pow(z, -1, P)
        wx, wy, wz, wt = refc.naive_msm(vals[o], refc.get_generators(4))
        wzinv = pow(wz, -1, P)
        assert (x * zinv % P, y * zinv % P) == (wx * wzinv % P, wy * wzinv % P), o
    lib.sxt_multiexp_handle_free(ctypes.c_void_p(handle))

    # sumcheck with a C callback through the ABI
    from blitzar_tpu.proof import sumcheck as sc

    n3, num_mles = 2, 2
    mles_ints = [[5, 6], [7, 8]]
    m = sc.SCALAR25519_CODEC.field.modulus
    mles_raw = bytearray()
    for row in mles_ints:  # column-major n x num_mles: all of mle0 then mle1
        for v in row:
            mles_raw += int(v).to_bytes(32, "little")
    mles_buf = (ctypes.c_uint8 * len(mles_raw)).from_buffer_copy(bytes(mles_raw))
    # product_table: one product {multiplier=1, len=2}
    pt_raw = int(1).to_bytes(32, "little") + (2).to_bytes(4, "little") + b"\x00" * 4
    pt_buf = (ctypes.c_uint8 * len(pt_raw)).from_buffer_copy(pt_raw)
    terms = (ctypes.c_uint32 * 2)(0, 1)

    class SumcheckDescriptor(ctypes.Structure):
        _fields_ = [
            ("mles", ctypes.c_void_p),
            ("product_table", ctypes.c_void_p),
            ("product_terms", ctypes.POINTER(ctypes.c_uint32)),
            ("n", ctypes.c_uint32),
            ("num_mles", ctypes.c_uint32),
            ("num_products", ctypes.c_uint32),
            ("num_product_terms", ctypes.c_uint32),
            ("round_degree", ctypes.c_uint32),
        ]

    desc2 = SumcheckDescriptor(
        ctypes.cast(mles_buf, ctypes.c_void_p),
        ctypes.cast(pt_buf, ctypes.c_void_p),
        terms, n3, num_mles, 1, 2, 2,
    )
    CB = ctypes.CFUNCTYPE(
        None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint
    )
    seen_polys = []

    def cb(r_ptr, context, poly_ptr, poly_len):
        data = ctypes.string_at(poly_ptr, 32 * poly_len)
        seen_polys.append(
            [int.from_bytes(data[32 * i : 32 * i + 32], "little") for i in range(poly_len)]
        )
        ctypes.memmove(r_ptr, int(99).to_bytes(32, "little"), 32)

    cb_c = CB(cb)
    polys_out = (ctypes.c_uint8 * (32 * 3 * 1))()
    eval_out = (ctypes.c_uint8 * 32)()
    lib.sxt_prove_sumcheck(
        polys_out, eval_out, 0, ctypes.byref(desc2),
        ctypes.cast(cb_c, ctypes.c_void_p), None,
    )
    # round poly of sum_i mle0[i]*mle1[i]: f(0)+f(1) must equal 5*7 + 6*8
    coeffs = [
        int.from_bytes(bytes(polys_out[32 * i : 32 * i + 32]), "little")
        for i in range(3)
    ]
    assert (2 * coeffs[0] + coeffs[1] + coeffs[2]) % m == (5 * 7 + 6 * 8) % m
    assert seen_polys and seen_polys[0] == coeffs
    assert int.from_bytes(bytes(eval_out), "little") == 99

    print("CAPI_OK")


if __name__ == "__main__":
    main(sys.argv[1])

"""Subprocess driver for the native C ABI tests: exercises libblitzar_tpu.so
via ctypes and prints CAPI_OK on success. Run in its own process because the
shim's panic() aborts (by design, mirroring the reference's panic-on-misuse),
which must not take the pytest process down."""

import ctypes
import sys

import numpy as np

sys.path.insert(0, sys.argv[2] if len(sys.argv) > 2 else ".")

from blitzar_tpu import api  # noqa: E402
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
    print("CAPI_OK")


if __name__ == "__main__":
    main(sys.argv[1])

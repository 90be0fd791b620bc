"""End-to-end test of the native C ABI (cbindings/): builds libblitzar_tpu.so,
loads it with ctypes, and checks results against the Python API — the
cross-surface equality style of the reference's cbindings tests (reference
cbindings/pedersen.t.cc, inner_product_proof.t.cc)."""

import ctypes
import shutil
import subprocess
import sys

import numpy as np
import pytest

from blitzar_tpu import api
from blitzar_tpu.proof.transcript import Transcript
from blitzar_tpu.refimpl import core as refc


class SequenceDescriptor(ctypes.Structure):
    _fields_ = [
        ("element_nbytes", ctypes.c_uint8),
        ("n", ctypes.c_uint64),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("is_signed", ctypes.c_int),
    ]


class Config(ctypes.Structure):
    _fields_ = [("backend", ctypes.c_int), ("num_precomputed_generators", ctypes.c_uint64)]


@pytest.fixture(scope="module")
def lib(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    out = tmp_path_factory.mktemp("capi")
    subprocess.run(
        ["cbindings/build.sh", str(out)], check=True, capture_output=True
    )
    api.reset_backend_for_testing()
    return ctypes.CDLL(str(out / "libblitzar_tpu.so"))


def test_struct_layout():
    assert ctypes.sizeof(SequenceDescriptor) == 32


def test_init_and_pedersen(lib):
    cfg = Config(1, 0)
    assert lib.sxt_init(ctypes.byref(cfg)) == 0

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
    assert bytes(out) == want


def test_get_generators_roundtrip(lib):
    n = 3
    out = (ctypes.c_uint64 * (20 * n))()
    assert lib.sxt_ristretto255_get_generators(out, 0, n) == 0
    # each generator: X,Y,Z,T in radix-2^51; check affine x/y vs refimpl
    p = 2**255 - 19
    gens = refc.get_generators(n)
    for i in range(n):
        limbs = [int(out[20 * i + j]) for j in range(20)]
        coords = [
            sum(v << (51 * k) for k, v in enumerate(limbs[5 * c : 5 * c + 5])) % p
            for c in range(4)
        ]
        x, y, z, t = coords
        zinv = pow(z, -1, p)
        assert (x * zinv % p, y * zinv % p) == (gens[i][0], gens[i][1])


def test_inner_product_roundtrip(lib):
    n = 2
    rng = np.random.default_rng(31)
    a = [int(rng.integers(1, 2**31)) for _ in range(n)]
    b = [int(rng.integers(1, 2**31)) for _ in range(n)]

    def scalars_buf(vals):
        raw = b"".join(int(v).to_bytes(32, "little") for v in vals)
        return (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)

    rounds = 1
    l_vec = (ctypes.c_uint8 * (32 * rounds))()
    r_vec = (ctypes.c_uint8 * (32 * rounds))()
    ap = (ctypes.c_uint8 * 32)()
    transcript = (ctypes.c_uint8 * 203).from_buffer_copy(
        Transcript(b"abc").to_bytes203()
    )
    lib.sxt_curve25519_prove_inner_product(
        l_vec, r_vec, ap, transcript, n, 0, scalars_buf(a), scalars_buf(b)
    )

    # a_commit = <a, G> computed via the Python refimpl
    gens = refc.get_generators(n)
    a_commit_pt = refc.naive_msm(a, gens)
    x, y, z, t = a_commit_pt
    p = 2**255 - 19
    raw = b"".join(
        b"".join(
            int((v >> (51 * k)) & ((1 << 51) - 1)).to_bytes(8, "little")
            for k in range(5)
        )
        for v in (x % p, y % p, z % p, t % p)
    )
    a_commit = (ctypes.c_uint8 * 160).from_buffer_copy(raw)

    product = sum(x * y for x, y in zip(a, b))
    transcript2 = (ctypes.c_uint8 * 203).from_buffer_copy(
        Transcript(b"abc").to_bytes203()
    )
    ok = lib.sxt_curve25519_verify_inner_product(
        transcript2, n, 0, scalars_buf(b), scalars_buf([product]), a_commit,
        l_vec, r_vec, ap,
    )
    assert ok == 1

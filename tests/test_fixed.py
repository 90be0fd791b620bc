"""Fixed-generator (partition table) MSM tests, mirroring the reference
pippenger2 suites (reference sxt/multiexp/pippenger2/*.t.cc): query vs naive
oracle, packed and variable-length variants, file round-trip."""

import numpy as np
import pytest

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.curves import weierstrass as wc
from blitzar_tpu.msm import engine, fixed
from blitzar_tpu.refimpl import core as refc


def _encode(points):
    return np.asarray(rst.encode(points)).T


def test_fixed_vs_dynamic_msm():
    n, num_outputs, nbytes = 12, 2, 4
    points = gen.ristretto_generators(n)
    handle = fixed.MultiexpHandle(points, window_width=4)
    rng = np.random.default_rng(5)
    scalars = rng.integers(0, 256, size=(num_outputs, n, nbytes), dtype=np.uint8)
    got = fixed.fixed_multiexponentiation(handle, scalars)
    want = engine.msm(
        points, [scalars[o] for o in range(num_outputs)], [nbytes] * num_outputs,
        [False] * num_outputs,
    )
    assert (_encode(got) == _encode(want)).all()


def test_fixed_weierstrass_curve():
    curve = wc.BN254_G1
    orc = curve.oracle
    n, nbytes = 9, 3
    pts = orc.random_points(n, seed=8)
    handle = fixed.MultiexpHandle(curve.from_affine_ints(pts), window_width=4, curve=curve)
    rng = np.random.default_rng(6)
    scalars = rng.integers(0, 256, size=(1, n, nbytes), dtype=np.uint8)
    got = curve.to_affine_ints(fixed.fixed_multiexponentiation(handle, scalars))
    ints = [int.from_bytes(bytes(scalars[0, i]), "little") for i in range(n)]
    assert got == [orc.msm(ints, pts)]


def _pack_bits(scalar_ints, output_bit_table, n):
    """Build the packed column-major byte array of blitzar_api.h:712-733."""
    bit_sum = sum(output_bit_table)
    num_bytes = -(-bit_sum // 8)
    out = np.zeros((n, num_bytes), np.uint8)
    for i in range(n):
        bitpos = 0
        for o, nbits in enumerate(output_bit_table):
            v = scalar_ints[o][i] if i < len(scalar_ints[o]) else 0
            for b in range(nbits):
                if (v >> b) & 1:
                    out[i, (bitpos + b) // 8] |= 1 << ((bitpos + b) % 8)
            bitpos += nbits
    return out


def test_packed_multiexponentiation():
    n = 8
    points = gen.ristretto_generators(n)
    handle = fixed.MultiexpHandle(points, window_width=4)
    rng = np.random.default_rng(7)
    bit_table = [10, 17]
    scalar_ints = [
        [int(rng.integers(0, 1 << nbits)) for _ in range(n)] for nbits in bit_table
    ]
    packed = _pack_bits(scalar_ints, bit_table, n)
    got = _encode(fixed.fixed_packed_multiexponentiation(handle, bit_table, n, packed))
    gens_ref = refc.get_generators(n)
    for o in range(2):
        want = refc.ristretto_encode(refc.naive_msm(scalar_ints[o], gens_ref))
        assert bytes(got[o]) == want, f"output {o}"


def test_vlen_multiexponentiation():
    n = 8
    points = gen.ristretto_generators(n)
    handle = fixed.MultiexpHandle(points, window_width=4)
    rng = np.random.default_rng(9)
    bit_table = [8, 12]
    lengths = [3, 8]
    scalar_ints = [
        [int(rng.integers(0, 1 << nbits)) for _ in range(n)] for nbits in bit_table
    ]
    packed = _pack_bits(scalar_ints, bit_table, n)
    got = _encode(
        fixed.fixed_vlen_multiexponentiation(handle, bit_table, lengths, packed)
    )
    gens_ref = refc.get_generators(n)
    for o in range(2):
        want = refc.ristretto_encode(
            refc.naive_msm(scalar_ints[o][: lengths[o]], gens_ref[: lengths[o]])
        )
        assert bytes(got[o]) == want, f"output {o}"


def test_handle_file_roundtrip(tmp_path):
    n = 6
    points = gen.ristretto_generators(n)
    handle = fixed.MultiexpHandle(points, window_width=4)
    path = str(tmp_path / "handle.npz")
    handle.write_to_file(path)
    loaded = fixed.MultiexpHandle.new_from_file(path)
    assert loaded.window_width == handle.window_width and loaded.n == handle.n
    rng = np.random.default_rng(11)
    scalars = rng.integers(0, 256, size=(1, n, 2), dtype=np.uint8)
    a = _encode(fixed.fixed_multiexponentiation(handle, scalars))
    b = _encode(fixed.fixed_multiexponentiation(loaded, scalars))
    assert (a == b).all()

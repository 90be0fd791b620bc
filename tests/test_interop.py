"""Reference-format partition-table file interop (msm/interop.py).

Format spec: reference in_memory_partition_table_accessor.h:42-64 (4-byte LE
window_width header + raw compact_element table, group-major subset sums).
"""

import struct

import numpy as np
import pytest

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.curves import weierstrass as wc
from blitzar_tpu.msm import fixed, interop
from blitzar_tpu.refimpl import core as R

MASK51 = (1 << 51) - 1


def _radix51(v):
    return [(v >> (51 * j)) & MASK51 for j in range(5)]


def test_ed_file_bytes_match_oracle(tmp_path):
    """The written file must equal a file built from the pure-Python oracle
    per the reference spec: entry v of group g = sum of generators with the
    corresponding bits set, stored as canonical radix-51 affine {X, Y, XY}."""
    n, w = 8, 4
    handle = fixed.MultiexpHandle(gen.ristretto_generators(n), window_width=w)
    path = str(tmp_path / "table.bin")
    interop.write_reference_file(handle, path)

    pts = R.get_generators(n)
    expected = bytearray(struct.pack("<I", w))
    for g in range(n // w):
        for v in range(1 << w):
            acc = None  # refimpl identity
            acc = (0, 1, 1, 0)
            for j in range(w):
                if v & (1 << j):
                    acc = R.pt_add(acc, pts[g * w + j])
            x, y, z, _t = acc
            zinv = pow(z, R.P - 2, R.P)
            xa, ya = x * zinv % R.P, y * zinv % R.P
            for val in (xa, ya, xa * ya % R.P):
                for limb in _radix51(val):
                    expected += struct.pack("<Q", limb)
    with open(path, "rb") as f:
        got = f.read()
    assert got == bytes(expected)


def test_ed_round_trip(tmp_path):
    n, w = 32, 4
    handle = fixed.MultiexpHandle(gen.ristretto_generators(n), window_width=w)
    path = str(tmp_path / "table.bin")
    interop.write_reference_file(handle, path)
    handle2 = interop.read_reference_file(path, ed)
    assert handle2.window_width == w
    assert handle2.n == n

    rng = np.random.default_rng(5)
    scalars = rng.integers(0, 256, size=(2, n, 32), dtype=np.uint8)
    a = np.asarray(rst.encode(fixed.fixed_multiexponentiation(handle, scalars)))
    b = np.asarray(rst.encode(fixed.fixed_multiexponentiation(handle2, scalars)))
    assert (a == b).all()


def test_w16_file_rewindowed_on_import(tmp_path):
    """Reference-written files default to window_width 16; import must
    re-window to w=8 (V=256) so queries ride the fused lookup kernel instead
    of the einsum fallback. The w=16 file is synthesized with the pure-Python
    oracle (subset-sum DP over 2^16 entries)."""
    n = 16  # one w=16 group -> two w=8 groups
    pts = R.get_generators(n)
    table = [(0, 1, 1, 0)] * (1 << 16)
    for v in range(1, 1 << 16):
        j = (v & -v).bit_length() - 1
        table[v] = R.pt_add(table[v & (v - 1)], pts[j])
    blob = bytearray(struct.pack("<I", 16))
    rows = np.empty((1 << 16, 15), np.uint64)
    for v, (x, y, z, _t) in enumerate(table):
        zinv = pow(z, R.P - 2, R.P)
        xa, ya = x * zinv % R.P, y * zinv % R.P
        rows[v, 0:5] = _radix51(xa)
        rows[v, 5:10] = _radix51(ya)
        rows[v, 10:15] = _radix51(xa * ya % R.P)
    blob += rows.astype("<u8").tobytes()
    path = str(tmp_path / "w16.bin")
    with open(path, "wb") as f:
        f.write(bytes(blob))

    handle = interop.read_reference_file(path, ed)
    assert handle.window_width == 8
    assert handle.num_groups == 2
    assert handle.n == n

    rng = np.random.default_rng(11)
    scalars = rng.integers(0, 256, size=(1, n, 4), dtype=np.uint8)
    got = np.asarray(
        rst.encode(fixed.fixed_multiexponentiation(handle, scalars))
    )
    vals = [int.from_bytes(bytes(scalars[0, i]), "little") for i in range(n)]
    want = R.ristretto_encode(R.naive_msm(vals, pts))
    assert bytes(got[:, 0]) == want


@pytest.mark.parametrize(
    "curve", [wc.BLS12381_G1, wc.BN254_G1, wc.GRUMPKIN], ids=lambda c: c.name
)
def test_weierstrass_round_trip(tmp_path, curve):
    n, w = 16, 4
    pts = curve.from_affine_ints(curve.oracle.random_points(n, seed=3))
    handle = fixed.MultiexpHandle(pts, window_width=w, curve=curve)
    path = str(tmp_path / f"{curve.name}.bin")
    interop.write_reference_file(handle, path)

    # identity marker spot check: entry 0 of group 0 is the identity
    with open(path, "rb") as f:
        data = f.read()
    nl64 = (curve.field.nlimbs * 16 + 63) // 64
    first_x = np.frombuffer(data, np.uint64, count=nl64, offset=4)
    assert first_x[nl64 - 1] == np.uint64(2**64 - 1)

    handle2 = interop.read_reference_file(path, curve)
    rng = np.random.default_rng(7)
    scalars = rng.integers(0, 256, size=(2, n, 32), dtype=np.uint8)
    a = fixed.fixed_multiexponentiation(handle, scalars)
    b = fixed.fixed_multiexponentiation(handle2, scalars)
    assert curve.to_affine_ints(a) == curve.to_affine_ints(b)


def test_api_new_from_file_sniffs_reference_format(tmp_path):
    """sxt_multiexp_handle_new_from_file must accept raw reference files."""
    from blitzar_tpu import api, cli

    out = str(tmp_path / "ref_table.bin")
    rc = cli.main(
        [
            "partition-table",
            "--curve",
            "ristretto255",
            "--n",
            "8",
            "--out",
            out,
            "--window-width",
            "4",
            "--format",
            "reference",
        ]
    )
    assert rc == 0
    handle = api.multiexp_handle_new_from_file(api.SXT_CURVE_RISTRETTO255, out)
    assert handle.n == 8 and handle.window_width == 4
    rng = np.random.default_rng(9)
    scalars = rng.integers(0, 256, size=(1, 8, 32), dtype=np.uint8)
    direct = fixed.MultiexpHandle(gen.ristretto_generators(8), window_width=4)
    a = np.asarray(rst.encode(fixed.fixed_multiexponentiation(handle, scalars)))
    b = np.asarray(rst.encode(fixed.fixed_multiexponentiation(direct, scalars)))
    assert (a == b).all()


def test_weierstrass_file_entry_matches_oracle(tmp_path):
    """Non-identity entries hold Montgomery-form affine coordinates."""
    curve = wc.BN254_G1
    n, w = 4, 4
    affine = curve.oracle.random_points(n, seed=11)
    pts = curve.from_affine_ints(affine)
    handle = fixed.MultiexpHandle(pts, window_width=w, curve=curve)
    path = str(tmp_path / "t.bin")
    interop.write_reference_file(handle, path)
    data = np.frombuffer(open(path, "rb").read(), np.uint64, offset=4).reshape(
        16, 8
    )
    F = curve.field
    p, r = F.modulus, F.r
    # entry 0b0001 = G[0]
    x_mont = sum(int(v) << (64 * j) for j, v in enumerate(data[1, :4]))
    y_mont = sum(int(v) << (64 * j) for j, v in enumerate(data[1, 4:]))
    assert x_mont == affine[0][0] * r % p
    assert y_mont == affine[0][1] * r % p
    # entry 0b0011 = G[0] + G[1]
    s = curve.oracle.add(affine[0], affine[1])
    x_mont = sum(int(v) << (64 * j) for j, v in enumerate(data[3, :4]))
    assert x_mont == s[0] * r % p

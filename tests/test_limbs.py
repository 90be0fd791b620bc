"""Vectorized ABI limb converters vs per-int oracles (pure numpy — these
back the capi_bridge struct marshalling and msm/interop file format;
reference layouts: blitzar_api.h:56-106 sxt_ristretto255 / Montgomery
structs, in_memory_partition_table_accessor.h compact_element)."""

import numpy as np

from blitzar_tpu.utils import limbs as L

P = 2**255 - 19


def _rand_u64(rng, shape):
    return rng.integers(0, 1 << 64, size=shape, dtype=np.uint64)


def test_f51_u64_to_limbs16_roundtrip_and_oracle():
    rng = np.random.default_rng(1)
    n = 257
    raw = _rand_u64(rng, (n, 5))
    # include canonical radix-51 rows and edge values
    raw[:64] >>= np.uint64(13)  # < 2^51
    raw[0] = [(P - 1 >> (51 * j)) & ((1 << 51) - 1) for j in range(5)]
    raw[1] = [(P >> (51 * j)) & ((1 << 51) - 1) for j in range(5)]  # == p -> 0
    raw[2] = 0
    got = L.f51_u64_to_limbs16(raw)
    assert got.shape == (16, n) and got.dtype == np.uint32
    for i in range(n):
        v = sum(int(raw[i, j]) << (51 * j) for j in range(5)) % P
        exp = [(v >> (16 * k)) & 0xFFFF for k in range(16)]
        assert [int(x) for x in got[:, i]] == exp, f"row {i}"

    back = L.limbs16_to_f51_u64(got)
    for i in range(n):
        v = sum(int(raw[i, j]) << (51 * j) for j in range(5)) % P
        assert sum(int(back[i, j]) << (51 * j) for j in range(5)) == v


def test_limbs16_to_f51_u64_noncanonical():
    # values in [p, 2^256): the converter must reduce canonically
    rng = np.random.default_rng(2)
    n = 64
    arr = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    arr[15, :8] = 0xFFFF  # force high values
    vals = [sum(int(arr[k, i]) << (16 * k) for k in range(16)) for i in range(n)]
    out = L.limbs16_to_f51_u64(arr)
    for i in range(n):
        got = sum(int(out[i, j]) << (51 * j) for j in range(5))
        assert got == vals[i] % P
        assert all(int(out[i, j]) < 1 << 51 for j in range(5))


def test_u64_limbs16_reinterpret_roundtrip():
    rng = np.random.default_rng(3)
    for nl64 in (4, 6):
        raw = _rand_u64(rng, (37, nl64))
        l16 = L.u64_to_limbs16(raw)
        assert l16.shape == (4 * nl64, 37)
        for i in range(37):
            v = sum(int(raw[i, j]) << (64 * j) for j in range(nl64))
            assert sum(int(l16[k, i]) << (16 * k) for k in range(4 * nl64)) == v
        back = L.limbs16_to_u64(l16)
        assert (back == raw).all()

"""Host-side packing between Python ints / bytes and limb arrays (numpy)."""

from __future__ import annotations

import numpy as np


def int_to_limbs(value: int, nlimbs: int, limb_bits: int = 16) -> np.ndarray:
    value %= 1 << (nlimbs * limb_bits)
    mask = (1 << limb_bits) - 1
    return np.array(
        [(value >> (limb_bits * i)) & mask for i in range(nlimbs)], dtype=np.uint32
    )


def limbs_to_int(limbs, limb_bits: int = 16) -> int:
    return sum(int(v) << (limb_bits * i) for i, v in enumerate(np.asarray(limbs)))


def ints_to_limbs(values, nlimbs: int, limb_bits: int = 16) -> np.ndarray:
    """(n,) python ints -> (nlimbs, n) uint32."""
    out = np.empty((nlimbs, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        out[:, j] = int_to_limbs(int(v), nlimbs, limb_bits)
    return out


def limbs_to_ints(arr, limb_bits: int = 16):
    """(nlimbs, n) -> list of python ints."""
    arr = np.asarray(arr)
    return [limbs_to_int(arr[:, j], limb_bits) for j in range(arr.shape[1])]


# ---------------------------------------------------------------------------
# vectorized ABI-layout converters (reference struct layouts are u64-limb
# arrays: sxt_ristretto255 = field51 radix-2^51, Weierstrass structs =
# Montgomery u64 limbs, blitzar_api.h:56-106). These are pure bit shuffles +
# carry chains in numpy — the reference's equivalent is a memcpy
# (in_memory_partition_table_accessor.h:95-104); per-int Python loops here
# took minutes at 2^20 points.
# ---------------------------------------------------------------------------

_P25519 = 2**255 - 19
_U = np.uint64


def _cond_sub_p25519(acc: np.ndarray) -> np.ndarray:
    """acc: (16, n) u64 radix-2^16 value < 2^255 -> canonical mod 2^255-19."""
    p_limbs = [( _P25519 >> (16 * i)) & 0xFFFF for i in range(16)]
    d = np.empty_like(acc)
    borrow = np.zeros(acc.shape[1], _U)
    for j in range(16):
        t = acc[j] + _U(0x10000) - _U(p_limbs[j]) - borrow
        d[j] = t & _U(0xFFFF)
        borrow = _U(1) - (t >> _U(16))
    take = borrow == 0  # acc >= p
    return np.where(take[None, :], d, acc)


def f51_u64_to_limbs16(raw: np.ndarray) -> np.ndarray:
    """(n, 5) uint64 radix-2^51 field51 limbs (any magnitude < 2^64) ->
    (16, n) uint32 canonical radix-2^16 limbs mod 2^255-19."""
    raw = np.asarray(raw, dtype=_U)
    n = raw.shape[0]
    acc = np.zeros((23, n), _U)
    for i in range(5):
        q, r = divmod(51 * i, 16)
        for k in range(4):
            c = (raw[:, i] >> _U(16 * k)) & _U(0xFFFF)
            s = c << _U(r)  # < 2^31
            acc[q + k] += s & _U(0xFFFF)
            acc[q + k + 1] += s >> _U(16)
    carry = np.zeros(n, _U)
    for j in range(23):
        t = acc[j] + carry
        acc[j] = t & _U(0xFFFF)
        carry = t >> _U(16)
    # fold bits >= 255 (value < 2^268, so only limbs 15-17 contribute)
    hi = acc[15] >> _U(15)
    for j in range(16, 18):
        hi |= acc[j] << _U(16 * (j - 16) + 1)
    lo = acc[:16]
    lo[15] &= _U(0x7FFF)
    carry = hi * _U(19)
    for j in range(16):
        t = lo[j] + carry
        lo[j] = t & _U(0xFFFF)
        carry = t >> _U(16)
    # second fold: bit 255 may have been set again (carry is 0 here)
    hi2 = lo[15] >> _U(15)
    lo[15] &= _U(0x7FFF)
    carry = hi2 * _U(19)
    for j in range(16):
        t = lo[j] + carry
        lo[j] = t & _U(0xFFFF)
        carry = t >> _U(16)
    return _cond_sub_p25519(lo).astype(np.uint32)


def limbs16_to_f51_u64(arr) -> np.ndarray:
    """(16, n) uint32 radix-2^16 limbs (value < 2^256) -> (n, 5) uint64
    canonical radix-2^51 field51 limbs mod 2^255-19."""
    a = np.asarray(arr).astype(_U)
    n = a.shape[1]
    hi = a[15] >> _U(15)
    a[15] &= _U(0x7FFF)
    carry = hi * _U(19)
    for j in range(16):
        t = a[j] + carry
        a[j] = t & _U(0xFFFF)
        carry = t >> _U(16)
    a = _cond_sub_p25519(a)
    w = np.zeros((4, n), _U)
    for k in range(4):
        for i in range(4):
            w[k] |= a[4 * k + i] << _U(16 * i)
    out = np.empty((n, 5), _U)
    mask51 = _U((1 << 51) - 1)
    for j in range(5):
        idx, s = divmod(51 * j, 64)
        d = w[idx] >> _U(s)
        if s and idx + 1 < 4:
            d |= w[idx + 1] << _U(64 - s)
        out[:, j] = d & mask51
    return out


def u64_to_limbs16(raw: np.ndarray) -> np.ndarray:
    """(n, k) uint64 little-endian limbs -> (4k, n) uint32 radix-2^16
    (pure bit reinterpretation; Montgomery residues stay Montgomery)."""
    raw = np.ascontiguousarray(np.asarray(raw, dtype="<u8"))
    u16 = raw.view("<u2").reshape(raw.shape[0], -1)  # (n, 4k)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def limbs16_to_u64(arr) -> np.ndarray:
    """(nlimbs, n) uint32 radix-2^16 (nlimbs % 4 == 0) -> (n, nlimbs//4)
    uint64 little-endian (pure bit reinterpretation)."""
    a = np.ascontiguousarray(np.asarray(arr).astype("<u2").T)  # (n, nl)
    return a.view("<u8")


def bytes_le_to_limbs(data: np.ndarray, nlimbs: int) -> np.ndarray:
    """(n, nbytes) uint8 little-endian -> (nlimbs, n) uint32 16-bit limbs.

    nbytes may be odd or smaller than 2*nlimbs; missing high bytes are zero.
    """
    data = np.asarray(data, dtype=np.uint8)
    n, nbytes = data.shape
    padded = np.zeros((n, 2 * nlimbs), dtype=np.uint8)
    padded[:, : min(nbytes, 2 * nlimbs)] = data[:, : 2 * nlimbs]
    u32 = padded.astype(np.uint32)
    limbs = u32[:, 0::2] | (u32[:, 1::2] << 8)  # (n, nlimbs)
    return np.ascontiguousarray(limbs.T)

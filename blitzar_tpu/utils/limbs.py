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

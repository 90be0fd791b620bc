"""Reference-format partition-table file interop.

The reference serializes a multiexp handle as (reference
in_memory_partition_table_accessor.h:42-64, write_to_file at :95-104):

    4-byte LE ``unsigned window_width``
    raw ``compact_element`` array, group-major: 2^w entries per group of w
    generators; entry v of group g = sum of {G[g*w + j] : bit j of v set}

``compact_element`` layouts per curve:

- curve25519 (curve21/type/compact_element.h): affine {X, Y, T = X*Y}, each a
  field51 element = 5x uint64 radix-2^51.  Identity = {0, 1, 0} (which is the
  actual affine identity, so no marker is needed).  We write canonical
  (fully-reduced) limbs; any valid representation is accepted on read.
- bls12-381 G1 (curve_g1/type/compact_element.h): affine {X, Y} in Montgomery
  form, 6x uint64 each; identity marked by X[5] == 2^64-1 with Y = one.
- bn254 / grumpkin (curve_bng1|curve_gk/type/compact_element.h): same with
  4x uint64 limbs; marker X[3] == 2^64-1.

This lets handles written by the reference's ``app/blitzar`` CLI be loaded
here and vice versa.  (Our own native format, ``MultiexpHandle.write_to_file``,
is an npz with the same content.)
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..curves import edwards25519 as ed
from ..utils import limbs as limb_util
from . import fixed

P25519 = 2**255 - 19
_MASK51 = (1 << 51) - 1


def _batch_inv(vals: list[int], p: int) -> list[int]:
    """Montgomery-trick batch modular inverse; zeros map to zero."""
    prefix = []
    acc = 1
    for v in vals:
        prefix.append(acc)
        if v:
            acc = acc * v % p
    inv_acc = pow(acc, p - 2, p)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        v = vals[i]
        if v:
            out[i] = prefix[i] * inv_acc % p
            inv_acc = inv_acc * v % p
    return out


def _limb16_to_ints(arr) -> list[int]:
    """(nlimbs, N) uint32 radix-2^16 limb array -> N Python ints."""
    a = np.ascontiguousarray(np.asarray(arr).astype(np.uint16).T)  # (N, nl)
    return [int.from_bytes(a[i].tobytes(), "little") for i in range(a.shape[0])]


def _ints_to_u64_radix51(vals: list[int]) -> np.ndarray:
    """(N,) ints -> (N, 5) uint64 radix-2^51 limbs (canonical reduced)."""
    out = np.empty((len(vals), 5), dtype=np.uint64)
    for i, v in enumerate(vals):
        for j in range(5):
            out[i, j] = (v >> (51 * j)) & _MASK51
    return out


def _u64_radix51_to_int(limbs: np.ndarray) -> int:
    return sum(int(limbs[j]) << (51 * j) for j in range(5)) % P25519


def _ints_to_u64(vals: list[int], nl64: int) -> np.ndarray:
    mask = (1 << 64) - 1
    out = np.empty((len(vals), nl64), dtype=np.uint64)
    for i, v in enumerate(vals):
        for j in range(nl64):
            out[i, j] = (v >> (64 * j)) & mask
    return out


def _u64_to_int(limbs) -> int:
    return sum(int(l) << (64 * j) for j, l in enumerate(limbs))


def _flat_table_coords(handle: fixed.MultiexpHandle):
    """Handle's point table -> per-coordinate flat int lists, entry-major
    (group-major, then table index within the group — the reference's
    memory order)."""
    table = handle._point_table()  # coords of (nlimbs, G, V)
    nl, g, v = table[0].shape
    coords = [np.asarray(c).reshape(nl, g * v) for c in table]
    return [_limb16_to_ints(c) for c in coords], g, v


def write_reference_file(handle: fixed.MultiexpHandle, path: str) -> None:
    """Serialize ``handle`` in the reference's raw compact_element format."""
    curve = handle.curve
    header = struct.pack("<I", handle.window_width)
    if curve is ed:
        (xs, ys, zs, _ts), g, v = _flat_table_coords(handle)
        zinv = _batch_inv(zs, P25519)
        n_entries = g * v
        xa = [0] * n_entries
        ya = [0] * n_entries
        ta = [0] * n_entries
        for i in range(n_entries):
            xi = xs[i] * zinv[i] % P25519
            yi = ys[i] * zinv[i] % P25519
            xa[i], ya[i], ta[i] = xi, yi, xi * yi % P25519
        rows = np.concatenate(
            [
                _ints_to_u64_radix51(xa),
                _ints_to_u64_radix51(ya),
                _ints_to_u64_radix51(ta),
            ],
            axis=1,
        )  # (N, 15)
    else:
        F = curve.field
        p, r = F.modulus, F.r
        nl64 = (F.nlimbs * 16 + 63) // 64
        (xs, ys, zs), g, v = _flat_table_coords(handle)
        rinv = pow(r, p - 2, p)
        # limb ints are Montgomery residues; go to standard domain for the
        # affine division, back to Montgomery for the file
        zs_std = [z * rinv % p for z in zs]
        zinv = _batch_inv(zs_std, p)
        n_entries = g * v
        xa = [0] * n_entries
        ya = [0] * n_entries
        inf = [False] * n_entries
        for i in range(n_entries):
            if zs_std[i] == 0:
                inf[i] = True
                continue
            # x~ = x*R, so x~ * z^-1 = (x/z)*R: affine x already in
            # Montgomery form, as the file expects
            xa[i] = xs[i] * zinv[i] % p
            ya[i] = ys[i] * zinv[i] % p
        x_rows = _ints_to_u64(xa, nl64)
        y_rows = _ints_to_u64(ya, nl64)
        one_mont = _ints_to_u64([r % p], nl64)[0]
        for i in range(n_entries):
            if inf[i]:
                x_rows[i] = 0
                x_rows[i, nl64 - 1] = np.uint64(2**64 - 1)
                y_rows[i] = one_mont
        rows = np.concatenate([x_rows, y_rows], axis=1)
    with open(path, "wb") as f:
        f.write(header)
        f.write(rows.tobytes())


def read_reference_file(path: str, curve=ed) -> fixed.MultiexpHandle:
    """Load a reference-format partition-table file into a MultiexpHandle."""
    with open(path, "rb") as f:
        data = f.read()
    (window_width,) = struct.unpack_from("<I", data, 0)
    body = np.frombuffer(data, dtype=np.uint64, offset=4)
    if curve is ed:
        entry_u64 = 15
        rows = body.reshape(-1, entry_u64)
        n_entries = rows.shape[0]
        xs = [_u64_radix51_to_int(rows[i, 0:5]) for i in range(n_entries)]
        ys = [_u64_radix51_to_int(rows[i, 5:10]) for i in range(n_entries)]
        nl = ed.nlimbs
        x_l = limb_util.ints_to_limbs(xs, nl)
        y_l = limb_util.ints_to_limbs(ys, nl)
        t_l = limb_util.ints_to_limbs([x * y % P25519 for x, y in zip(xs, ys)], nl)
        z_l = limb_util.ints_to_limbs([1] * n_entries, nl)
        table = ed.make_point(
            *(jnp.asarray(c) for c in (x_l, y_l, z_l, t_l))
        )
    else:
        F = curve.field
        p = F.modulus
        nl64 = (F.nlimbs * 16 + 63) // 64
        entry_u64 = 2 * nl64
        rows = body.reshape(-1, entry_u64)
        n_entries = rows.shape[0]
        marker = np.uint64(2**64 - 1)
        xs, ys, zs = [], [], []
        for i in range(n_entries):
            if rows[i, nl64 - 1] == marker:
                xs.append(0), ys.append(F.r % p), zs.append(0)
            else:
                xs.append(_u64_to_int(rows[i, 0:nl64]) % p)
                ys.append(_u64_to_int(rows[i, nl64:entry_u64]) % p)
                zs.append(F.r % p)  # Montgomery 1
        nl = F.nlimbs
        table = curve.make_point(
            *(
                jnp.asarray(limb_util.ints_to_limbs(c, nl))
                for c in (xs, ys, zs)
            )
        )
    v = 1 << window_width
    assert n_entries % v == 0, "file size inconsistent with window width"
    groups = n_entries // v
    table = curve.make_point(*(c.reshape(nl, groups, v) for c in table))

    obj = fixed.MultiexpHandle.__new__(fixed.MultiexpHandle)
    obj.curve = curve
    obj.window_width = int(window_width)
    obj.n = groups * int(window_width)
    obj.table = table
    obj.num_groups = groups
    obj.t_split = fixed._split_table(table, curve)
    return obj

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

Field math (affine normalization) runs on device in one jitted batch; the
host side is vectorized numpy bit-shuffles (utils/limbs.py) — the
reference's equivalent is a raw memcpy
(in_memory_partition_table_accessor.h:95-104), so per-int Python loops here
were off the table.
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..curves import edwards25519 as ed
from ..utils import limbs as limb_util
from . import fixed

P25519 = 2**255 - 19


@jax.jit
def _ed_affine_xyt(coords):
    """Extended (x, y, z, t) coord arrays (nl, N) -> affine (x, y, x*y)."""
    x, y, z, _t = coords
    zinv = fixed._batch_invert_lanes(z)
    xa = fixed._fmul(x, zinv)
    ya = fixed._fmul(y, zinv)
    return xa, ya, fixed._fmul(xa, ya)


@functools.partial(jax.jit, static_argnames=("curve",))
def _w_affine_xy(coords, curve):
    """Projective (x, y, z) coord arrays (nl, N) -> affine Montgomery
    (x, y, infinity_mask); identity entries (z = 0) give x = y = 0."""
    f = curve.field
    x, y, z = coords
    # zeros (identity entries) poison the scans; replace z by 1 there and
    # mask the result instead
    nonzero = ~f.is_zero(z)
    one = f.one(z.shape[1:])
    z_safe = f.cmov(one, z, nonzero)
    prefix = lax.associative_scan(f.mul, z_safe, axis=z.ndim - 1)
    suffix = lax.associative_scan(f.mul, z_safe, axis=z.ndim - 1, reverse=True)
    total_inv = f.inv(prefix[..., -1:])
    ones = f.one(z.shape[1:-1] + (1,))
    p_exc = jnp.concatenate([ones, prefix[..., :-1]], axis=-1)
    s_exc = jnp.concatenate([suffix[..., 1:], ones], axis=-1)
    zinv = f.mul(f.mul(p_exc, s_exc), jnp.broadcast_to(total_inv, p_exc.shape))
    zinv = f.cmov(f.zeros(z.shape[1:]), zinv, nonzero)
    return f.mul(x, zinv), f.mul(y, zinv), ~nonzero


def write_reference_file(handle: fixed.MultiexpHandle, path: str) -> None:
    """Serialize ``handle`` in the reference's raw compact_element format."""
    curve = handle.curve
    header = struct.pack("<I", handle.window_width)
    table = handle._point_table()  # coords of (nlimbs, G, V)
    nl, g, v = table[0].shape
    flat = [c.reshape(nl, g * v) for c in table]
    if curve is ed:
        xa, ya, ta = _ed_affine_xyt(flat)
        rows = np.concatenate(
            [
                limb_util.limbs16_to_f51_u64(np.asarray(xa)),
                limb_util.limbs16_to_f51_u64(np.asarray(ya)),
                limb_util.limbs16_to_f51_u64(np.asarray(ta)),
            ],
            axis=1,
        )  # (N, 15)
    else:
        f = curve.field
        nl64 = f.nbytes // 8
        xa, ya, inf = _w_affine_xy(flat, curve)
        x_rows = limb_util.limbs16_to_u64(np.asarray(xa))  # (N, nl64)
        y_rows = limb_util.limbs16_to_u64(np.asarray(ya))
        inf = np.asarray(inf)
        one_mont = limb_util.limbs16_to_u64(
            np.asarray(f._int_limbs(f.r))[:, None]
        )[0]
        x_rows[inf] = 0
        x_rows[inf, nl64 - 1] = np.uint64(2**64 - 1)
        y_rows[inf] = one_mont
        rows = np.concatenate([x_rows, y_rows], axis=1)
    with open(path, "wb") as f_out:
        f_out.write(header)
        f_out.write(np.ascontiguousarray(rows).astype("<u8").tobytes())


def read_reference_file(path: str, curve=ed) -> fixed.MultiexpHandle:
    """Load a reference-format partition-table file into a MultiexpHandle."""
    with open(path, "rb") as f:
        data = f.read()
    (window_width,) = struct.unpack_from("<I", data, 0)
    body = np.frombuffer(data, dtype="<u8", offset=4)
    if curve is ed:
        rows = body.reshape(-1, 15)
        n_entries = rows.shape[0]
        x_l = limb_util.f51_u64_to_limbs16(rows[:, 0:5])
        y_l = limb_util.f51_u64_to_limbs16(rows[:, 5:10])
        t_l = limb_util.f51_u64_to_limbs16(rows[:, 10:15])  # file stores X*Y
        z_l = np.zeros_like(x_l)
        z_l[0] = 1
        nl = ed.nlimbs
        table = ed.make_point(
            *(jnp.asarray(c) for c in (x_l, y_l, z_l, t_l))
        )
    else:
        f = curve.field
        nl64 = f.nbytes // 8
        rows = body.reshape(-1, 2 * nl64)
        n_entries = rows.shape[0]
        inf = rows[:, nl64 - 1] == np.uint64(2**64 - 1)  # identity marker
        x_l = limb_util.u64_to_limbs16(rows[:, 0:nl64])  # Montgomery residues
        y_l = limb_util.u64_to_limbs16(rows[:, nl64:])
        one_mont = np.asarray(f._int_limbs(f.r))[:, None]
        x_l = np.where(inf[None, :], 0, x_l)
        y_l = np.where(inf[None, :], np.broadcast_to(one_mont, y_l.shape), y_l)
        z_l = np.where(
            inf[None, :], 0, np.broadcast_to(one_mont, x_l.shape)
        ).astype(np.uint32)
        nl = f.nlimbs
        table = curve.make_point(
            *(jnp.asarray(c) for c in (x_l, y_l, z_l))
        )
    v = 1 << window_width
    assert n_entries % v == 0, "file size inconsistent with window width"
    groups = n_entries // v
    table = curve.make_point(*(c.reshape(nl, groups, v) for c in table))

    if window_width > 8 and window_width % 8 == 0:
        # Re-window to w=8: the reference's default width is 16, but 2^16-lane
        # table entries miss the fused lookup kernel (ops/pallas_point.py
        # requires V=256) and waste HBM. A w table contains every w'=8 table
        # entry already — the subset of sub-slot s's generators with bit
        # pattern u sits at index u << (8*s) — so re-windowing is pure
        # indexing, no group math.
        k = window_width // 8
        idx = np.arange(256, dtype=np.int64)
        cols = np.concatenate([idx << (8 * s) for s in range(k)])  # (k*256,)
        table = curve.make_point(
            *(
                jnp.asarray(c)[:, :, jnp.asarray(cols)]
                .reshape(nl, groups * k, 256)
                for c in table
            )
        )
        window_width = 8
        groups *= k

    obj = fixed.MultiexpHandle.__new__(fixed.MultiexpHandle)
    obj.curve = curve
    obj.window_width = int(window_width)
    obj.n = groups * int(window_width)
    obj.table = table
    obj.num_groups = groups
    obj.t_split = fixed._split_table(table, curve)
    return obj

"""Multi-chip MSM: shard the point axis over a device mesh.

TPU-native translation of the reference's multi-GPU generator-range split
(reference multiexp/curve/multiexponentiation.h:176-194 and
bucket_method/accumulation.h:96-162): each device bucket-accumulates its
contiguous slice of (points, scalars) locally with zero communication, then
the fixed-size (R, 255)-point partial bucket arrays are all-gathered over ICI
and folded. Communication is O(num_buckets), independent of n, so scaling is
near-linear in the point count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..curves import edwards25519 as ed
from ..fields import fp25519 as F
from . import engine

AXIS = "points"
OUT_AXIS = "outputs"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def make_mesh2d(outputs: int, points: int, devices=None) -> Mesh:
    """2-D (outputs x points) mesh: many-output MSMs shard the output axis
    too (the reference distributes outputs round-robin over devices for
    small-n many-output problems, bucket_method2/multiexponentiation.h:
    108-121; here both axes shard simultaneously). For multi-host runs make
    the outputs axis the outer (DCN) dimension: output shards never
    communicate, so only the O(outputs*bits) point-axis fold rides the
    slower links."""
    devices = devices if devices is not None else jax.devices()
    assert outputs * points == len(devices)
    return Mesh(
        np.asarray(devices).reshape(outputs, points), (OUT_AXIS, AXIS)
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_outputs", "num_windows", "capacity", "mesh", "curve"),
)
def msm_sharded_jit(
    points,
    digits: jnp.ndarray,
    signs: jnp.ndarray,
    num_outputs: int,
    num_windows: int,
    capacity: int,
    mesh: Mesh,
    curve=ed,
):
    """digits (O, W, n), n divisible by mesh size -> (O,) points (replicated)."""
    r_rows = num_outputs * num_windows
    n = digits.shape[-1]
    digits = digits.reshape(r_rows, n)
    signs = jnp.broadcast_to(
        signs[:, None, :], (num_outputs, num_windows, n)
    ).reshape(r_rows, n)

    def local(pts, d, s):
        buckets = engine.bucket_accumulate_chunked(pts, d, s, capacity, curve)
        gathered = jax.lax.all_gather(buckets, AXIS)  # leaves (D, nlimbs, R, 255)
        stacked = curve.make_point(*(jnp.moveaxis(c, 0, -1) for c in gathered))
        return engine.combine_buckets(
            curve.tree_reduce(stacked, mesh.size), num_outputs, num_windows, curve
        )

    shard_pt = P(None, AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            curve.make_point(*([shard_pt] * curve.coord_count)),
            shard_pt,
            shard_pt,
        ),
        out_specs=curve.make_point(*([P()] * curve.coord_count)),
        # the while-loop carry starts replicated (identity points) and becomes
        # device-varying after the first gather; skip the static VMA check
        check_vma=False,
    )(points, digits, signs)


@functools.partial(
    jax.jit,
    static_argnames=("window_width", "num_outputs", "nbits", "mesh", "curve"),
)
def msm_partition_sharded_jit(
    points, scalars_dev, window_width: int, num_outputs: int, nbits: int,
    mesh: Mesh, curve=ed,
):
    """Partition-table MSM sharded over the point axis.

    Each device builds partition tables for its contiguous generator slice
    and computes local per-bit partial products; the (num_outputs * nbits,)
    partial points are all-gathered (O(outputs * bits) communication,
    independent of n — the multi-chip shape of reference
    pippenger2/multiexponentiation.h:99-133) and folded, then the doubling
    ladder runs replicated."""
    from . import fixed as _fixed

    def local(pts, scal):
        table = _fixed._build_table(curve.make_point(*pts), window_width, curve)
        t_split = _fixed._split_table_jit(table, curve)
        o, n_local, nbytes = scal.shape
        shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, None, :]
        bits = (scal[:, :, :, None] >> shifts) & jnp.uint8(1)
        rows = bits.reshape(o, n_local, nbits).transpose(0, 2, 1).reshape(
            o * nbits, n_local
        )
        products = _fixed._partition_products(t_split, rows, window_width, curve)
        gathered = jax.lax.all_gather(jnp.stack(list(products)), AXIS)
        # (D, coords, nlimbs, R) -> fold over D
        parts = curve.make_point(
            *(jnp.moveaxis(gathered[:, k], 0, -1) for k in range(curve.coord_count))
        )
        total = curve.tree_reduce(parts, mesh.size)  # (R,)
        prods = curve.reshape_batch(total, (num_outputs, nbits))
        return _fixed._doubling_combine(prods, nbits, curve)

    shard_pt = P(None, AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=([shard_pt] * curve.coord_count, P(None, AXIS, None)),
        out_specs=curve.make_point(*([P()] * curve.coord_count)),
        check_vma=False,
    )(list(points), scalars_dev)


@functools.partial(
    jax.jit,
    static_argnames=("window_width", "num_outputs", "nbits", "mesh", "curve"),
)
def msm_partition_sharded2d_jit(
    points, scalars_dev, window_width: int, num_outputs: int, nbits: int,
    mesh: Mesh, curve=ed,
):
    """Partition-table MSM on a 2-D (outputs x points) mesh: points and
    their tables shard over AXIS (replicated across output shards); scalars
    and result points shard over OUT_AXIS. The per-bit partial-product fold
    all-gathers over AXIS only — output shards never communicate."""
    from . import fixed as _fixed

    def local(pts, scal):
        table = _fixed._build_table(curve.make_point(*pts), window_width, curve)
        t_split = _fixed._split_table_jit(table, curve)
        o_local, n_local, nbytes = scal.shape
        shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, None, :]
        bits = (scal[:, :, :, None] >> shifts) & jnp.uint8(1)
        rows = bits.reshape(o_local, n_local, nbits).transpose(0, 2, 1).reshape(
            o_local * nbits, n_local
        )
        products = _fixed._partition_products(t_split, rows, window_width, curve)
        gathered = jax.lax.all_gather(jnp.stack(list(products)), AXIS)
        parts = curve.make_point(
            *(jnp.moveaxis(gathered[:, k], 0, -1) for k in range(curve.coord_count))
        )
        total = curve.tree_reduce(parts, mesh.shape[AXIS])  # (o_local*nbits,)
        prods = curve.reshape_batch(total, (o_local, nbits))
        return _fixed._doubling_combine(prods, nbits, curve)

    shard_pt = P(None, AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=([shard_pt] * curve.coord_count, P(OUT_AXIS, AXIS, None)),
        out_specs=curve.make_point(
            *([P(None, OUT_AXIS)] * curve.coord_count)
        ),
        check_vma=False,
    )(list(points), scalars_dev)


@functools.partial(
    jax.jit,
    static_argnames=("window_width", "num_outputs", "nbits", "mesh", "curve"),
)
def msm_partition_sharded_signed_jit(
    points, scalars_dev, signs_dev, window_width: int, num_outputs: int,
    nbits: int, mesh: Mesh, curve=ed,
):
    """Signed partition-table MSM sharded over the point axis: the
    single-chip two-mask trick (fixed._query_signed_jit — positive and
    negative bit-row blocks against ONE local table, result = Q_pos - Q_neg)
    run per device slice, with the same O(outputs * bits) all-gather as the
    unsigned kernel. Replaces the previous fallback to the sort-based bucket
    engine, which is ~100x off roofline on TPU (reference signed handling:
    multiexp/curve/multiproduct.h:32-58)."""
    from . import fixed as _fixed

    def local(pts, scal, sgn):
        table = _fixed._build_table(curve.make_point(*pts), window_width, curve)
        t_split = _fixed._split_table_jit(table, curve)
        o, n_local, nbytes = scal.shape
        shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, None, :]
        bits = (scal[:, :, :, None] >> shifts) & jnp.uint8(1)
        rows = bits.reshape(o, n_local, nbits).transpose(0, 2, 1)  # (O,b,n)
        neg = (sgn == 1)[:, None, :]
        rows_pos = jnp.where(neg, jnp.uint8(0), rows)
        rows_neg = jnp.where(neg, rows, jnp.uint8(0))
        all_rows = jnp.concatenate([rows_pos, rows_neg]).reshape(
            2 * o * nbits, n_local
        )
        products = _fixed._partition_products(
            t_split, all_rows, window_width, curve
        )
        gathered = jax.lax.all_gather(jnp.stack(list(products)), AXIS)
        parts = curve.make_point(
            *(jnp.moveaxis(gathered[:, k], 0, -1) for k in range(curve.coord_count))
        )
        total = curve.tree_reduce(parts, mesh.shape[AXIS])  # (2*O*bits,)
        p_pos = curve.reshape_batch(
            curve.index_batch(total, (slice(0, o * nbits),)), (o, nbits)
        )
        p_neg = curve.reshape_batch(
            curve.index_batch(total, (slice(o * nbits, 2 * o * nbits),)),
            (o, nbits),
        )
        q_pos = _fixed._doubling_combine(p_pos, nbits, curve)
        q_neg = _fixed._doubling_combine(p_neg, nbits, curve)
        return curve.add(q_pos, curve.neg(q_neg))

    shard_pt = P(None, AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            [shard_pt] * curve.coord_count,
            P(None, AXIS, None),
            P(None, AXIS),
        ),
        out_specs=curve.make_point(*([P()] * curve.coord_count)),
        check_vma=False,
    )(list(points), scalars_dev, signs_dev)


def msm_partition_signed(mesh: Mesh, points, scalars, signs, n: int, curve=ed):
    """scalars: (O, n, nbytes) uint8 MAGNITUDES; signs: (O, n) uint8."""
    num_outputs, _, nbytes = scalars.shape
    d = mesh.size
    w = 8 if n <= (1 << 20) else 4
    n_pad = -(-n // (d * w)) * (d * w)
    if scalars.shape[1] < n_pad:
        scalars = np.pad(scalars, ((0, 0), (0, n_pad - scalars.shape[1]), (0, 0)))
    if signs.shape[1] < n_pad:
        signs = np.pad(signs, ((0, 0), (0, n_pad - signs.shape[1])))
    npts = points.x.shape[-1]
    if npts < n_pad:
        pad = curve.identity((n_pad - npts,))
        points = curve.make_point(
            *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(points, pad))
        )
    elif npts > n_pad:
        points = curve.index_batch(points, (slice(0, n_pad),))
    return msm_partition_sharded_signed_jit(
        points, jnp.asarray(scalars), jnp.asarray(signs), w, num_outputs,
        8 * nbytes, mesh, curve,
    )


def msm_partition2d(mesh: Mesh, points, scalars, n: int, curve=ed):
    """Many-output entry for the 2-D mesh: scalars (O, n, nbytes) uint8
    unsigned; O divisible-padded over the outputs axis, n over points."""
    num_outputs, _, nbytes = scalars.shape
    d_out = mesh.shape[OUT_AXIS]
    d_pts = mesh.shape[AXIS]
    w = 8 if n <= (1 << 20) else 4
    n_pad = -(-n // (d_pts * w)) * (d_pts * w)
    o_pad = -(-num_outputs // d_out) * d_out
    if scalars.shape[1] < n_pad or num_outputs < o_pad:
        scalars = np.pad(
            scalars,
            ((0, o_pad - num_outputs), (0, n_pad - scalars.shape[1]), (0, 0)),
        )
    npts = points.x.shape[-1]
    if npts < n_pad:
        pad = curve.identity((n_pad - npts,))
        points = curve.make_point(
            *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(points, pad))
        )
    elif npts > n_pad:
        points = curve.index_batch(points, (slice(0, n_pad),))
    out = msm_partition_sharded2d_jit(
        points, jnp.asarray(scalars), w, o_pad, 8 * nbytes, mesh, curve
    )
    if o_pad != num_outputs:
        out = curve.index_batch(out, (slice(0, num_outputs),))
    return out


def msm_partition(mesh: Mesh, points, scalars, n: int, curve=ed):
    """scalars: (O, n, nbytes) uint8 (unsigned); points: (>= n,) batch."""
    num_outputs, _, nbytes = scalars.shape
    d = mesh.size
    w = 8 if n <= (1 << 20) else 4
    n_pad = -(-n // (d * w)) * (d * w)
    if scalars.shape[1] < n_pad:
        scalars = np.pad(scalars, ((0, 0), (0, n_pad - scalars.shape[1]), (0, 0)))
    npts = points.x.shape[-1]
    if npts < n_pad:
        pad = curve.identity((n_pad - npts,))
        points = curve.make_point(
            *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(points, pad))
        )
    elif npts > n_pad:
        points = curve.index_batch(points, (slice(0, n_pad),))
    return msm_partition_sharded_jit(
        points, jnp.asarray(scalars), w, num_outputs, 8 * nbytes, mesh, curve
    )


def msm(mesh: Mesh, points, data_list, nbytes_list, signed_list, curve=ed):
    """Host entry: sharded generalized Pedersen MSM over shared generators."""
    scalars, signs, n = engine.prepare_scalars(data_list, nbytes_list, signed_list)
    num_outputs, _, max_nbytes = scalars.shape
    if n == 0 or num_outputs == 0:
        return curve.identity((max(num_outputs, 0),))
    if not any(signed_list):
        return msm_partition(mesh, points, scalars, n, curve)
    import os as _os

    if _os.environ.get("BLITZAR_TPU_MSM_ENGINE") != "bucket":
        return msm_partition_signed(mesh, points, scalars, signs, n, curve)
    # legacy sort-based bucket path (env-selected only)
    # pad n to a power of two >= 8 * mesh size so shards are equal
    n_pad = 8 * mesh.size
    while n_pad < n:
        n_pad *= 2
    if n_pad != n:
        scalars = np.pad(scalars, ((0, 0), (0, n_pad - n), (0, 0)))
        signs = np.pad(signs, ((0, 0), (0, n_pad - n)))
    npts = points.x.shape[-1]
    if npts < n_pad:  # pad points with identity so shards line up
        pad = curve.identity((n_pad - npts,))
        points = curve.make_point(
            *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(points, pad))
        )
    elif npts > n_pad:
        points = curve.index_batch(points, (slice(0, n_pad),))
    digits = engine.digit_decompose(jnp.asarray(scalars))
    capacity = engine.choose_capacity(max(n // mesh.size, 1))
    return msm_sharded_jit(
        points,
        digits,
        jnp.asarray(signs),
        num_outputs=num_outputs,
        num_windows=max_nbytes,
        capacity=capacity,
        mesh=mesh,
        curve=curve,
    )

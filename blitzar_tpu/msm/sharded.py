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


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


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


def msm(mesh: Mesh, points, data_list, nbytes_list, signed_list, curve=ed):
    """Host entry: sharded generalized Pedersen MSM over shared generators."""
    scalars, signs, n = engine.prepare_scalars(data_list, nbytes_list, signed_list)
    num_outputs, _, max_nbytes = scalars.shape
    if n == 0 or num_outputs == 0:
        return curve.identity((max(num_outputs, 0),))
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

"""Pallas TPU kernels for the curve25519 group law — the hot ops of the MSM
engine (reference counterpart: the inner loops of
sxt/multiexp/bucket_method/accumulation_kernel.h and
sxt/curve21/operation/add.h, which CUDA compiles once as __device__ code).

Why a kernel instead of plain XLA: one unified Edwards add is ~10^4 scalar
HLO ops after 16x16-limb expansion. Traced inline at every tree-reduction
level, XLA compile time explodes (and XLA's fusion decisions around the limb
chains are fragile). Here the whole add/double body is ONE pallas_call —
Mosaic compiles the straight-line vector program once per shape, all limb
intermediates stay in VMEM/registers, and the HLO graph stays tiny.

Layout: a coordinate batch (16, *batch) uint32 is flattened and tiled to
(16, M, 128) — the minor axis rides the 128 lanes, M rides the sublanes, and
the grid walks M in blocks.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import fp25519 as F

LANES = 128
M_BLK = 8  # sublane block: 8*128 = 1024 lanes per grid step per limb


def use_pallas() -> bool:
    env = os.environ.get("BLITZAR_TPU_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    from ..utils.backend import compute_platform

    return compute_platform() == "tpu"


# ---------------------------------------------------------------------------
# kernels (bodies reuse the plain jnp limb formulas — Mosaic compiles them)
# ---------------------------------------------------------------------------


def _add_body(px, py, pz, pt, qx, qy, qz, qt, ox, oy, oz, ot):
    from ..curves import edwards25519 as ed

    with F.diag_mode():
        p = ed.PointP3(px[:], py[:], pz[:], pt[:])
        q = ed.PointP3(qx[:], qy[:], qz[:], qt[:])
        r = ed._add_impl(p, q)
    ox[:], oy[:], oz[:], ot[:] = r.x, r.y, r.z, r.t


def _double_body(px, py, pz, pt, ox, oy, oz, ot):
    from ..curves import edwards25519 as ed

    with F.diag_mode():
        p = ed.PointP3(px[:], py[:], pz[:], pt[:])
        r = ed._double_impl(p)
    ox[:], oy[:], oz[:], ot[:] = r.x, r.y, r.z, r.t


def _niels_add_kernel_body(pa, pb, pt, qa, qb, qt, ox, oy, oz, ot):
    from ..curves import edwards25519 as ed

    with F.diag_mode():
        n1 = ed.Niels(pa[:], pb[:], pt[:])
        n2 = ed.Niels(qa[:], qb[:], qt[:])
        r = ed._niels_add_impl(n1, n2)
    ox[:], oy[:], oz[:], ot[:] = r.x, r.y, r.z, r.t


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _niels_add_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32) for _ in range(4)
    ]
    return pl.pallas_call(
        _niels_add_kernel_body,
        grid=(m // blk,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


def niels_add(n1, n2, interpret: bool = False):
    from ..curves import edwards25519 as ed

    out = _run(list(n1) + list(n2), _niels_add_tiled, interpret)
    return ed.PointP3(*out)


def _tiles(c, m):
    """(16, B) -> (16, m, 128) zero-padded."""
    b = c.shape[1]
    flat = jnp.zeros((F.NLIMBS, m * LANES), jnp.uint32)
    flat = jax.lax.dynamic_update_slice(flat, c, (0, 0))
    return flat.reshape(F.NLIMBS, m, LANES)


# ---------------------------------------------------------------------------
# elementwise field-arithmetic kernels: one multiply inline in XLA
# materializes a (16, 16, batch) outer product in HBM (~16x the operand
# size per multiply), which makes mul-heavy host-path code — batch
# inversions, the niels normalization, elligator chains — memory-bound.
# The kernel runs the diagonal formulation entirely in VMEM.
# ---------------------------------------------------------------------------


def _fmul_body(a_ref, b_ref, o_ref):
    with F.diag_mode():
        o_ref[:] = F.mul(a_ref[:], b_ref[:])


def _fsq_body(a_ref, o_ref):
    with F.diag_mode():
        o_ref[:] = F.sq(a_ref[:])


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _fmul_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    return pl.pallas_call(
        _fmul_body,
        grid=(m // blk,),
        in_specs=[spec] * 2,
        out_specs=[spec],
        out_shape=[jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32)],
        interpret=interpret,
    )(*coords)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _fsq_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    return pl.pallas_call(
        _fsq_body,
        grid=(m // blk,),
        in_specs=[spec],
        out_specs=[spec],
        out_shape=[jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32)],
        interpret=interpret,
    )(*coords)


def fmul(a, b, interpret: bool = False):
    """Field multiply (fp25519 limb arrays, equal shapes) via one kernel."""
    return _run([a, b], _fmul_tiled, interpret)[0]


def fsq(a, interpret: bool = False):
    return _run([a], _fsq_tiled, interpret)[0]


def _finvert_body(a_ref, o_ref):
    with F.diag_mode():
        o_ref[:] = F.invert(a_ref[:])


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _finvert_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    return pl.pallas_call(
        _finvert_body,
        grid=(m // blk,),
        in_specs=[spec],
        out_specs=[spec],
        out_shape=[jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32)],
        interpret=interpret,
    )(*coords)


def finvert(a, interpret: bool = False):
    """Whole ~270-mul inversion chain in ONE kernel — the chain has tiny
    per-op compute, so issuing it as 254 separate kernels is pure dispatch
    latency (measured seconds per batch-inversion on the tunnel host)."""
    return _run([a], _finvert_tiled, interpret)[0]


# ---------------------------------------------------------------------------
# fused generator derivation: elligator(r1) + elligator(r0) in ONE kernel
# (the canonical-generator map, generators.py). Each elligator is a
# ~260-mul sqrt chain; inline XLA pays HBM for every intermediate, the
# kernel keeps the whole chain in VMEM.
# ---------------------------------------------------------------------------


def _elligator_form_body(r0_ref, r1_ref, ox, oy, oz, ot):
    from ..curves import edwards25519 as ed
    from ..curves import ristretto as rst

    with F.diag_mode():
        p = rst.elligator(r1_ref[:])
        q = rst.elligator(r0_ref[:])
        r = ed._add_impl(p, q)
    ox[:], oy[:], oz[:], ot[:] = r.x, r.y, r.z, r.t


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _elligator_form_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32) for _ in range(4)
    ]
    return pl.pallas_call(
        _elligator_form_body,
        grid=(m // blk,),
        in_specs=[spec] * 2,
        out_specs=[spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


def elligator_form(r0_limbs, r1_limbs, interpret: bool = False):
    """(16, *batch) x2 -> PointP3: elligator(r1) + elligator(r0)."""
    from ..curves import edwards25519 as ed

    out = _run([r0_limbs, r1_limbs], _elligator_form_tiled, interpret)
    return ed.PointP3(*out)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _add_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32) for _ in range(4)
    ]
    return pl.pallas_call(
        _add_body,
        grid=(m // blk,),
        in_specs=[spec] * 8,
        out_specs=[spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _double_tiled(coords, m: int, interpret: bool):
    blk = min(M_BLK, m)
    spec = pl.BlockSpec((F.NLIMBS, blk, LANES), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((F.NLIMBS, m, LANES), jnp.uint32) for _ in range(4)
    ]
    return pl.pallas_call(
        _double_body,
        grid=(m // blk,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


def _run(point_coords, tiled_fn, interpret):
    """Flatten batch -> tiles -> kernel -> restore batch shape."""
    batch_shape = point_coords[0].shape[1:]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    m = -(-b // LANES)
    m = -(-m // M_BLK) * M_BLK if m > M_BLK else m
    flat = [c.reshape(F.NLIMBS, b) for c in point_coords]
    tiles = [_tiles(c, m) for c in flat]
    out = tiled_fn(tiles, m, interpret)
    return [
        c.reshape(F.NLIMBS, m * LANES)[:, :b].reshape((F.NLIMBS,) + batch_shape)
        for c in out
    ]


# On TPU route (almost) every add/double through the kernel: padding a tiny
# batch to one (8, 128) tile costs ~µs at runtime, while tracing the plain
# limb formulas inline costs ~10^4 HLO ops of compile time per call site.
MIN_LANES = 2


def add(p, q, interpret: bool = False):
    from ..curves import edwards25519 as ed

    out = _run(list(p) + list(q), _add_tiled, interpret)
    return ed.PointP3(*out)


def double(p, interpret: bool = False):
    from ..curves import edwards25519 as ed

    out = _run(list(p), _double_tiled, interpret)
    return ed.PointP3(*out)


# ---------------------------------------------------------------------------
# in-kernel tree reduction over the LAST (lane) axis: one pallas_call folds
# (nlimbs, R, size) -> (nlimbs, R) with log2(size) halving adds on VMEM
# values — contiguous half-slices (pair (i, i + size/2)) keep every slice a
# legal static lane slice, and the inter-level slabs never touch HBM
# ---------------------------------------------------------------------------


def _tree_body_factory(curve, size: int, diag_ctx):
    # reduce down to 128 lanes (the minimum legal output lane width); the
    # cheap <=128 tail finishes outside the kernel
    def body(*refs):
        ins, outs = refs[: curve.coord_count], refs[curve.coord_count :]
        with diag_ctx():
            vals = [r[:] for r in ins]  # (nl, r_blk, size)
            cur = size
            while cur > LANES:
                half = cur // 2
                lo = curve.make_point(*(v[:, :, :half] for v in vals))
                hi = curve.make_point(*(v[:, :, half : 2 * half] for v in vals))
                vals = list(curve._add_impl(lo, hi))
                cur = half
        for o, v in zip(outs, vals):
            o[:] = v

    return body


TREE_R_BLK = 8
TREE_VMEM_BUDGET = 12 << 20


def _tree_blk(curve, size: int, r: int) -> int:
    per_row = curve.coord_count * curve.nlimbs * size * 4 * 3  # vals + temps
    blk = max(1, TREE_VMEM_BUDGET // per_row)
    return min(TREE_R_BLK, blk, r)


@functools.partial(jax.jit, static_argnames=("curve", "size", "interpret"))
def _tree_tiled(coords, curve, size: int, interpret: bool):
    nl = curve.nlimbs
    r = coords[0].shape[1]
    blk = _tree_blk(curve, size, r)
    in_spec = pl.BlockSpec((nl, blk, size), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((nl, blk, LANES), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((nl, r, LANES), jnp.uint32)
        for _ in range(curve.coord_count)
    ]
    if curve.coord_count == 4:
        diag_ctx = F.diag_mode
    else:
        from ..fields import mont as _mont

        diag_ctx = _mont.diag_mode
    return pl.pallas_call(
        _tree_body_factory(curve, size, diag_ctx),
        grid=(-(-r // blk),),
        in_specs=[in_spec] * curve.coord_count,
        out_specs=[out_spec] * curve.coord_count,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


def tree_reduce_lanes(curve, point, size: int, interpret: bool = False):
    """point: (R, size) batch with size a power of two -> (R,) batch, summed
    over the last axis entirely inside one kernel."""
    r = point[0].shape[1]
    blk = _tree_blk(curve, size, r)
    pad = (-r) % blk
    coords = list(point)
    if pad:
        ident = curve.identity((pad, size))
        coords = [
            jnp.concatenate([c, ic], axis=1) for c, ic in zip(coords, ident)
        ]
    out = _tree_tiled(coords, curve, size, interpret)
    if pad:
        out = [c[:, :r] for c in out]
    point128 = curve.make_point(*out)  # (R, 128)
    return curve.tree_reduce(point128, LANES)


def tree_fits(curve, size: int) -> bool:
    per_row = curve.coord_count * curve.nlimbs * size * 4 * 3
    return (size & (size - 1)) == 0 and size > LANES and per_row <= TREE_VMEM_BUDGET


# ---------------------------------------------------------------------------
# niels tree reduction: input is a (R, size) batch of niels-form TABLE
# ENTRIES (a, b, t — 3 coords, z = 1); the first halving level uses the
# cheaper 7-mul niels+niels add, later levels the standard extended add.
# This is the reduce stage of the partition-product query (msm/fixed.py).
# ---------------------------------------------------------------------------


def _niels_tree_body_factory(size: int):
    def body(ra, rb, rt, ox, oy, oz, ot):
        from ..curves import edwards25519 as ed

        with F.diag_mode():
            a, b, t = ra[:], rb[:], rt[:]
            half = size // 2
            n1 = ed.Niels(a[:, :, :half], b[:, :, :half], t[:, :, :half])
            n2 = ed.Niels(a[:, :, half:], b[:, :, half:], t[:, :, half:])
            vals = list(ed._niels_add_impl(n1, n2))
            cur = half
            while cur > LANES:
                h = cur // 2
                lo = ed.PointP3(*(v[:, :, :h] for v in vals))
                hi = ed.PointP3(*(v[:, :, h : 2 * h] for v in vals))
                vals = list(ed._add_impl(lo, hi))
                cur = h
        for o, v in zip((ox, oy, oz, ot), vals):
            o[:] = v

    return body


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def _niels_tree_tiled(coords, size: int, interpret: bool):
    from ..curves import edwards25519 as ed

    nl = F.NLIMBS
    r = coords[0].shape[1]
    blk = _tree_blk(ed, size, r)
    in_spec = pl.BlockSpec((nl, blk, size), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((nl, blk, LANES), lambda i: (0, i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((nl, r, LANES), jnp.uint32) for _ in range(4)
    ]
    return pl.pallas_call(
        _niels_tree_body_factory(size),
        grid=(-(-r // blk),),
        in_specs=[in_spec] * 3,
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


def niels_tree_reduce_lanes(niels, size: int, interpret: bool = False):
    """niels: ed.Niels batch (R, size), size a power of two > 128 ->
    (R,) extended points."""
    from ..curves import edwards25519 as ed

    r = niels[0].shape[1]
    blk = _tree_blk(ed, size, r)
    pad = (-r) % blk
    coords = list(niels)
    if pad:
        # niels identity: (1, 1, 0)
        pad_a = F.from_int_const(1, (pad, size))
        pad_t = F.zeros((pad, size))
        pads = (pad_a, pad_a, pad_t)
        coords = [jnp.concatenate([c, pc], axis=1) for c, pc in zip(coords, pads)]
    out = _niels_tree_tiled(coords, size, interpret)
    if pad:
        out = [c[:, :r] for c in out]
    point128 = ed.PointP3(*out)  # (R, 128)
    return ed.tree_reduce(point128, LANES)


# ---------------------------------------------------------------------------
# fused partition-table lookup + accumulate (the whole hot path of the
# fixed-MSM query, msm/fixed.py _partition_products): the grid streams
# (GT, 2L, V) table tiles through VMEM; for each of the GT groups the
# transposed one-hot (V, RB) is formed IN VMEM and contracted on the MXU
# against the tile's (2L, V) bytes; the selected niels entries are
# accumulated into GT extended-point accumulators with 7-mul mixed adds
# (curves/edwards25519.py _madd_impl). Neither the one-hot nor the selected
# entries ever touch HBM — the XLA fallback materializes both, and that
# traffic dominates its runtime.
# ---------------------------------------------------------------------------

LOOKUP_RB = 256  # scalar-bit rows per block
LOOKUP_GT = 16  # table groups per grid step (16 beat 32/64 on v5e: smaller tiles double-buffer better under the ~16MB VMEM)


def _lookup_body_factory(gt: int, v_dim: int, rb: int, ncoord: int):
    """ncoord = 3: niels table entries, 7-mul madd accumulation;
    ncoord = 4: cached (projective) entries, 8-mul cadd accumulation."""

    def body(t_ref, idx_ref, ox, oy, oz, ot):
        from ..curves import edwards25519 as ed

        g_step = pl.program_id(1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (v_dim, rb), 0)
        sels = []
        for j in range(gt):
            onehot_t = (idx_ref[j, :][None, :] == iota).astype(t_ref.dtype)
            sels.append(
                jnp.dot(t_ref[j], onehot_t, preferred_element_type=jnp.float32)
            )  # (2L, RB)
        st = jnp.stack(sels, axis=1)  # (2L, GT, RB)
        nl = F.NLIMBS
        # Mosaic has no f32->u32 cast; round-trip through i32 (values < 256)
        si = st.astype(jnp.int32).astype(jnp.uint32)
        u = si[: ncoord * nl] | (si[ncoord * nl :] << 8)  # (ncoord*16, GT, RB)

        with F.diag_mode():

            @pl.when(g_step == 0)
            def _init():
                zero = jnp.zeros((nl, gt, rb), jnp.uint32)
                one = jnp.concatenate(
                    [jnp.full((1, gt, rb), 1, jnp.uint32),
                     jnp.zeros((nl - 1, gt, rb), jnp.uint32)],
                    axis=0,
                )
                ox[:], oy[:], oz[:], ot[:] = zero, one, one, zero

            acc = ed.PointP3(ox[:], oy[:], oz[:], ot[:])
            if ncoord == 3:
                n = ed.Niels(u[0:nl], u[nl : 2 * nl], u[2 * nl : 3 * nl])
                r = ed._madd_impl(acc, n)
            else:
                c = ed.Cached(
                    u[0:nl], u[nl : 2 * nl], u[2 * nl : 3 * nl], u[3 * nl :]
                )
                r = ed._cadd_impl(acc, c)
        ox[:], oy[:], oz[:], ot[:] = r.x, r.y, r.z, r.t

    return body


@functools.partial(jax.jit, static_argnames=("rb", "interpret"))
def _lookup_tiled(t_flat, idx, rb: int, interpret: bool):
    groups, l2, v_dim = t_flat.shape
    r = idx.shape[1]
    gt = LOOKUP_GT
    nl = F.NLIMBS
    grid = (r // rb, groups // gt)
    out_shape = [
        jax.ShapeDtypeStruct((nl, gt, r), jnp.uint32) for _ in range(4)
    ]
    return pl.pallas_call(
        _lookup_body_factory(gt, v_dim, rb, l2 // (2 * F.NLIMBS)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gt, l2, v_dim), lambda ri, gi: (gi, 0, 0)),
            # idx arrives transposed (G, R): the row axis must ride the
            # 128-divisible minor block dim (Mosaic block-shape rule)
            pl.BlockSpec((gt, rb), lambda ri, gi: (gi, ri)),
        ],
        out_specs=[
            pl.BlockSpec((nl, gt, rb), lambda ri, gi: (0, 0, ri))
        ] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(t_flat, idx)


def lookup_msm_fits(groups: int, v_dim: int, r_rows: int) -> bool:
    # rows below one (8, 128) tile would leave the kernel's vector lanes
    # mostly idle AND produce sub-128 block minor dims; use the XLA path
    return (
        v_dim == 256
        and groups >= LOOKUP_GT
        and groups % LOOKUP_GT == 0
        and r_rows >= 128
    )


def ed_lookup_msm(t_flat, idx, interpret: bool = False):
    """t_flat: (G, 96, 256) byte-split niels table; idx: (R, G) int32 table
    indices -> (R,) extended points: sum_g table[g, idx[r, g]]."""
    from ..curves import edwards25519 as ed

    r_rows, groups = idx.shape
    rb = min(LOOKUP_RB, max(8, -(-r_rows // 8) * 8))
    r_pad = -(-r_rows // rb) * rb
    if r_pad != r_rows:
        idx = jnp.pad(idx, ((0, r_pad - r_rows), (0, 0)))  # entry 0 = identity
    out = _lookup_tiled(t_flat, idx.T, rb, interpret)  # 4 x (16, GT, r_pad)
    pt = ed.PointP3(*(jnp.swapaxes(c, 1, 2) for c in out))  # (16, r_pad, GT)
    total = ed.tree_reduce(pt, LOOKUP_GT)  # (r_pad,)
    return ed.index_batch(total, (slice(0, r_rows),))


# ---------------------------------------------------------------------------
# curve-generic fused lookup + accumulate (Weierstrass variant of
# ed_lookup_msm above): same streaming-tile structure, but table entries are
# byte-split projective (x, y, z) coords in Montgomery form and accumulation
# is the complete RCB a=0 add (curves/weierstrass.py _add_impl) in the
# MontField's diag mode. This puts bls12-381/bn254/grumpkin fixed-MSM queries
# on the MXU path instead of the ~50x-slower one-hot einsum fallback
# (reference's partition-product kernel is curve-generic,
# pippenger2/partition_product.h:47-92).
# ---------------------------------------------------------------------------

W_LOOKUP_RB = 256  # scalar-bit rows per block
W_LOOKUP_GT = 8  # table groups per grid step (24-limb bls tiles are 1.5x
# an ed niels tile per group; 8 keeps the working set double-bufferable)


def _w_lookup_body_factory(curve, gt: int, v_dim: int, rb: int):
    from ..fields import mont as _mont

    nl = curve.nlimbs

    def body(t_ref, idx_ref, ox, oy, oz):
        g_step = pl.program_id(1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (v_dim, rb), 0)
        sels = []
        for j in range(gt):
            onehot_t = (idx_ref[j, :][None, :] == iota).astype(t_ref.dtype)
            sels.append(
                jnp.dot(t_ref[j], onehot_t, preferred_element_type=jnp.float32)
            )  # (2L, RB)
        st = jnp.stack(sels, axis=1)  # (2L, GT, RB)
        si = st.astype(jnp.int32).astype(jnp.uint32)
        u = si[: 3 * nl] | (si[3 * nl :] << 8)  # (3*nl, GT, RB)

        with _mont.diag_mode():

            @pl.when(g_step == 0)
            def _init():
                ident = curve.identity((gt, rb))
                ox[:], oy[:], oz[:] = ident.x, ident.y, ident.z

            acc = curve.make_point(ox[:], oy[:], oz[:])
            sel = curve.make_point(u[0:nl], u[nl : 2 * nl], u[2 * nl :])
            r = curve._add_impl(acc, sel)
        ox[:], oy[:], oz[:] = r.x, r.y, r.z

    return body


@functools.partial(jax.jit, static_argnames=("curve", "rb", "interpret"))
def _w_lookup_tiled(curve, t_flat, idx, rb: int, interpret: bool):
    groups, l2, v_dim = t_flat.shape
    r = idx.shape[1]
    gt = W_LOOKUP_GT
    nl = curve.nlimbs
    grid = (r // rb, groups // gt)
    out_shape = [
        jax.ShapeDtypeStruct((nl, gt, r), jnp.uint32) for _ in range(3)
    ]
    return pl.pallas_call(
        _w_lookup_body_factory(curve, gt, v_dim, rb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gt, l2, v_dim), lambda ri, gi: (gi, 0, 0)),
            pl.BlockSpec((gt, rb), lambda ri, gi: (gi, ri)),
        ],
        out_specs=[
            pl.BlockSpec((nl, gt, rb), lambda ri, gi: (0, 0, ri))
        ] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(t_flat, idx)


def w_lookup_msm_fits(groups: int, v_dim: int, r_rows: int) -> bool:
    return (
        v_dim == 256
        and groups >= W_LOOKUP_GT
        and groups % W_LOOKUP_GT == 0
        and r_rows >= 128
    )


def w_lookup_msm(curve, t_flat, idx, interpret: bool = False):
    """t_flat: (G, 6*nlimbs, 256) byte-split projective table; idx: (R, G)
    int32 table indices -> (R,) projective points: sum_g table[g, idx[r, g]]."""
    r_rows, groups = idx.shape
    rb = min(W_LOOKUP_RB, max(8, -(-r_rows // 8) * 8))
    r_pad = -(-r_rows // rb) * rb
    if r_pad != r_rows:
        idx = jnp.pad(idx, ((0, r_pad - r_rows), (0, 0)))  # entry 0 = identity
    out = _w_lookup_tiled(curve, t_flat, idx.T, rb, interpret)
    pt = curve.make_point(*(jnp.swapaxes(c, 1, 2) for c in out))  # (nl, r_pad, GT)
    total = curve.tree_reduce(pt, W_LOOKUP_GT)  # (r_pad,)
    return curve.index_batch(total, (slice(0, r_rows),))


# ---------------------------------------------------------------------------
# fused partition-table BUILD kernel: the whole handle/streamed-chunk table
# build is ONE pallas_call. Each grid step takes BUILD_BG groups of w
# generators, runs the w subset-doubling concats (table_{j+1} =
# [table_j | table_j + G_j]) entirely in VMEM, converts to the storage form
# (niels via an in-kernel log-depth batch inversion, cached via two adds +
# const-mul, Weierstrass projective as-is), byte-splits, and writes the
# (BG, 2L, V) tile. Replaces a lax.map of hundreds of small XLA/Pallas
# dispatches per chunk (adds, associative scans, inversions) whose dispatch
# + HBM round trips made sxt_multiexp_handle_new cost ~4600x its own query
# (reference builds tables inline with deployment workflows,
# pippenger2/partition_table.h:36-98).
# ---------------------------------------------------------------------------

BUILD_BG = 8  # generator groups per grid step: the in-flight extended
# table (4 coords x (nl, bg, 2^w) u32 = 2.1 MB at w=8) plus add/scan temps
# must fit ~16 MB VMEM. Inputs are 3-D (nl, G, w) so each block is
# (nl, bg, w) with the minor dim equal to the full array dim — the only
# shape Mosaic accepts for a sub-128 lane count (and it avoids any
# in-kernel lane reshape, which Mosaic cannot lower).


def _build_bg(w: int) -> int:
    return BUILD_BG


def _lane_batch_invert(z, v_dim: int, field):
    """1/z along the last axis of a (nl, bg, V) VMEM value: log-depth
    Hillis-Steele prefix/suffix product scans + ONE v-lane-narrow inversion
    chain — ~(2 log2 V + 3) muls per entry instead of ~254."""
    prefix = z
    s = 1
    while s < v_dim:
        head = prefix[..., :s]
        tail = field.mul(prefix[..., s:], prefix[..., :-s])
        prefix = jnp.concatenate([head, tail], axis=-1)
        s *= 2
    suffix = z
    s = 1
    while s < v_dim:
        tail = suffix[..., -s:]
        head = field.mul(suffix[..., :-s], suffix[..., s:])
        suffix = jnp.concatenate([head, tail], axis=-1)
        s *= 2
    total_inv = field.invert(prefix[..., -1:])  # (nl, bg, 1)
    one = field.from_int_const(1, z.shape[1:-1] + (1,))
    p_exc = jnp.concatenate([one, prefix[..., :-1]], axis=-1)
    s_exc = jnp.concatenate([suffix[..., 1:], one], axis=-1)
    return field.mul(
        field.mul(p_exc, s_exc), jnp.broadcast_to(total_inv, p_exc.shape)
    )


def _byte_split_stack(stored, out_dtype):
    """coords (nl, bg, V) -> (bg, 2L, V): limb rows moved to axis -2,
    low bytes then high bytes, cast to the table dtype."""
    full = jnp.concatenate([jnp.moveaxis(s, 0, 1) for s in stored], axis=1)
    lo = (full & jnp.uint32(0xFF)).astype(jnp.int32).astype(out_dtype)
    hi = (full >> 8).astype(jnp.int32).astype(out_dtype)
    return jnp.concatenate([lo, hi], axis=1)


def _subset_double_concat(curve, pts, w: int, bg: int):
    """pts: coords (nl, bg, w) in VMEM -> extended/projective table coords
    (nl, bg, 2^w): entry v = sum of the group's points selected by v's bits."""
    nl = curve.nlimbs
    vals = list(curve.identity((bg, 1)))
    for j in range(w):
        width = 1 << j
        gj_b = [
            jnp.broadcast_to(c[:, :, j : j + 1], (nl, bg, width)) for c in pts
        ]
        shifted = curve._add_impl(
            curve.make_point(*vals), curve.make_point(*gj_b)
        )
        vals = [jnp.concatenate([v, s], axis=-1) for v, s in zip(vals, shifted)]
    return vals


def _ed_build_body_factory(w: int, bg: int, form: str, out_dtype):
    from ..curves import edwards25519 as ed

    v_dim = 1 << w
    nl = 16

    def body(px, py, pz, pt, out_ref):
        with F.diag_mode():
            pts = [r[:] for r in (px, py, pz, pt)]  # (nl, bg, w) blocks
            x, y, z, t = _subset_double_concat(ed, pts, w, bg)
            if form == "niels":
                zinv = _lane_batch_invert(z, v_dim, F)
                xa = F.mul(x, zinv)
                ya = F.mul(y, zinv)
                stored = (
                    F.add(ya, xa),
                    F.sub(ya, xa),
                    F.mul_const(F.mul(xa, ya), ed.D2_INT),
                )
            else:  # cached: (y+x, y-x, z, 2d*t) — no inversion
                c = ed.to_cached(ed.PointP3(x, y, z, t))
                stored = (c.a, c.b, c.z, c.t)
            out_ref[:] = _byte_split_stack(stored, out_dtype)

    return body


def _w_build_body_factory(curve, w: int, bg: int, out_dtype):
    from ..fields import mont as _mont

    nl = curve.nlimbs

    def body(px, py, pz, out_ref):
        with _mont.diag_mode():
            pts = [r[:] for r in (px, py, pz)]  # (nl, bg, w) blocks
            coords = _subset_double_concat(curve, pts, w, bg)
            out_ref[:] = _byte_split_stack(coords, out_dtype)

    return body


@functools.partial(
    jax.jit, static_argnames=("curve", "w", "form", "out_dtype", "interpret")
)
def _build_split_tiled(coords, curve, w: int, form: str, out_dtype, interpret: bool):
    """coords: ncoord x (nl, G, w) -> (G, 2L, V) byte-split table."""
    from ..curves import edwards25519 as ed

    nl = curve.nlimbs
    groups = coords[0].shape[1]
    bg = _build_bg(w)
    if curve is ed:
        ncoord_out = 3 if form == "niels" else 4
        body = _ed_build_body_factory(w, bg, form, out_dtype)
    else:
        ncoord_out = curve.coord_count
        body = _w_build_body_factory(curve, w, bg, out_dtype)
    l2 = 2 * ncoord_out * nl
    v_dim = 1 << w
    # coords arrive (nl, G, w); blocks are (nl, bg, w) — minor dim equals
    # the array dim (Mosaic's allowance for sub-128 lanes)
    in_spec = pl.BlockSpec((nl, bg, w), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec((bg, l2, v_dim), lambda i: (i, 0, 0))
    return pl.pallas_call(
        body,
        grid=(groups // bg,),
        in_specs=[in_spec] * curve.coord_count,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((groups, l2, v_dim), out_dtype),
        interpret=interpret,
    )(*coords)


def build_split_fits(groups: int, w: int) -> bool:
    # per-block VMEM: extended table coords 4*(nl*bg*V)*4B plus add/scan
    # temps — w <= 8 with bg = 8 stays a few MB; wider windows would blow
    # VMEM
    bg = _build_bg(w)
    return w <= 8 and groups >= bg and groups % bg == 0


def build_split_table(points, w: int, curve, form: str, out_dtype, interpret=False):
    """points: curve batch (n,), n = G*w -> (G, 2L, V) split table, one
    fused kernel (see header comment above)."""
    coords = [c.reshape(curve.nlimbs, -1, w) for c in points]
    return _build_split_tiled(coords, curve, w, form, out_dtype, interpret)


# ---------------------------------------------------------------------------
# fused doubling-ladder combine: out[o] = sum_b 2^b * products[o, b]
# (reference pippenger2/reduce.h doubling reduction). One kernel instead of
# num_bits sequential (double + add) dispatches — the ladder's tiny widths
# make per-op dispatch overhead dominate outside a kernel.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# generic short-Weierstrass kernels (bls12-381 G1 / bn254 G1 / Grumpkin):
# same tiling as the Edwards kernels, parameterized by the WCurve instance
# (its Montgomery field runs in diag_mode inside the body)
# ---------------------------------------------------------------------------


def _wadd_body_factory(curve):
    from ..fields import mont as _mont

    def body(px, py, pz, qx, qy, qz, ox, oy, oz):
        with _mont.diag_mode():
            p = curve.make_point(px[:], py[:], pz[:])
            q = curve.make_point(qx[:], qy[:], qz[:])
            r = curve._add_impl(p, q)
        ox[:], oy[:], oz[:] = r.x, r.y, r.z

    return body


def _wdouble_body_factory(curve):
    from ..fields import mont as _mont

    def body(px, py, pz, ox, oy, oz):
        with _mont.diag_mode():
            p = curve.make_point(px[:], py[:], pz[:])
            r = curve._double_impl(p)
        ox[:], oy[:], oz[:] = r.x, r.y, r.z

    return body


@functools.partial(jax.jit, static_argnames=("curve", "m", "interpret"))
def _wadd_tiled(coords, curve, m: int, interpret: bool):
    blk = min(M_BLK, m)
    nl = curve.nlimbs
    spec = pl.BlockSpec((nl, blk, LANES), lambda i: (0, i, 0))
    out_shape = [jax.ShapeDtypeStruct((nl, m, LANES), jnp.uint32) for _ in range(3)]
    return pl.pallas_call(
        _wadd_body_factory(curve),
        grid=(m // blk,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


@functools.partial(jax.jit, static_argnames=("curve", "m", "interpret"))
def _wdouble_tiled(coords, curve, m: int, interpret: bool):
    blk = min(M_BLK, m)
    nl = curve.nlimbs
    spec = pl.BlockSpec((nl, blk, LANES), lambda i: (0, i, 0))
    out_shape = [jax.ShapeDtypeStruct((nl, m, LANES), jnp.uint32) for _ in range(3)]
    return pl.pallas_call(
        _wdouble_body_factory(curve),
        grid=(m // blk,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


def _wtiles(c, m, nl):
    b = c.shape[1]
    flat = jnp.zeros((nl, m * LANES), jnp.uint32)
    flat = jax.lax.dynamic_update_slice(flat, c, (0, 0))
    return flat.reshape(nl, m, LANES)


def _wrun(curve, point_coords, tiled_fn, interpret):
    nl = curve.nlimbs
    batch_shape = point_coords[0].shape[1:]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    m = -(-b // LANES)
    m = -(-m // M_BLK) * M_BLK if m > M_BLK else m
    flat = [c.reshape(nl, b) for c in point_coords]
    tiles = [_wtiles(c, m, nl) for c in flat]
    out = tiled_fn(tiles, curve, m, interpret)
    return [
        c.reshape(nl, m * LANES)[:, :b].reshape((nl,) + batch_shape) for c in out
    ]


def wadd(curve, p, q, interpret: bool = False):
    out = _wrun(curve, list(p) + list(q), _wadd_tiled, interpret)
    return curve.make_point(*out)


def wdouble(curve, p, interpret: bool = False):
    out = _wrun(curve, list(p), _wdouble_tiled, interpret)
    return curve.make_point(*out)


def _combine_body_factory(num_bits: int):
    # input layout (16, num_bits, O): the bit axis rides the SUBLANE dim so
    # the ladder's dynamic per-bit slice is a ref sublane slice (dynamic LANE
    # indices must be 128-aligned in Mosaic, sublane indices need not be)
    def body(px, py, pz, pt, ox, oy, oz, ot):
        from jax import lax as _lax

        from ..curves import edwards25519 as ed

        refs = (px, py, pz, pt)
        with F.diag_mode():
            acc = ed.PointP3(*(r[:, num_bits - 1, :] for r in refs))

            def step(i, acc):
                acc = ed._double_impl(acc)
                b = num_bits - 2 - i
                row = ed.PointP3(
                    *(r[:, pl.ds(b, 1), :][:, 0, :] for r in refs)
                )
                return ed._add_impl(acc, row)

            if num_bits > 1:
                acc = _lax.fori_loop(0, num_bits - 1, step, acc)
        ox[:], oy[:], oz[:], ot[:] = acc.x, acc.y, acc.z, acc.t

    return body


@functools.partial(jax.jit, static_argnames=("num_bits", "interpret"))
def _combine_tiled(coords, num_bits: int, interpret: bool):
    # coords arrive as (16, O, num_bits); present them as (16, num_bits, O)
    coords = [jnp.swapaxes(c, 1, 2) for c in coords]
    o = coords[0].shape[2]
    out_shape = [jax.ShapeDtypeStruct((F.NLIMBS, o), jnp.uint32) for _ in range(4)]
    return pl.pallas_call(
        _combine_body_factory(num_bits),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*coords)


# VMEM guard: inputs are O * num_bits * 4 coords * 64B
COMBINE_VMEM_BUDGET = 6 << 20


def doubling_combine(products, num_bits: int, interpret: bool = False):
    """products: point batch (O, num_bits) -> (O,)."""
    from ..curves import edwards25519 as ed

    out = _combine_tiled(list(products), num_bits, interpret)
    return ed.PointP3(*out)


def combine_fits(o: int, num_bits: int) -> bool:
    return o * num_bits * 4 * F.NLIMBS * 4 * 3 <= COMBINE_VMEM_BUDGET


# ---------------------------------------------------------------------------
# fused sumcheck round kernels (generic MontField, diag mode — the same
# pattern as the Weierstrass kernels above): the round-polynomial product
# expansion and the fold both run entirely in VMEM. The inline-XLA skew
# multiplies materialize (nl, nl, lanes) outer products in HBM per multiply,
# which made each 2^20 round cost ~2 s; in-kernel the whole expansion is
# register/VMEM traffic (reference counterpart: sumcheck's fused
# partial_sum_kernel, proof/sumcheck/sum_gpu.h:60-149).
# ---------------------------------------------------------------------------

MONT_SUM_BLK = 1024  # lanes per grid step (VMEM: (nl, m, blk) x 2 inputs
# + ~degree+2 live (nl, blk) expansion temps — a few MB for nl=16, m<=8)


def _mont_sum_body_factory(field, terms_struct, degree: int, blk: int):
    from ..fields import mont as _mont

    nl = field.nlimbs

    def body(lo_ref, hi_ref, mults_ref, out_ref):
        with _mont.diag_mode():
            lo = lo_ref[:]
            hi = hi_ref[:]
            mults = mults_ref[:]
            poly = [None] * (degree + 1)
            for prod_index, terms in enumerate(terms_struct):
                a0 = lo[:, terms[0]]
                b0 = field.sub(hi[:, terms[0]], a0)
                p = [a0, b0]
                for t in terms[1:]:
                    a = lo[:, t]
                    b = field.sub(hi[:, t], a)
                    new_p = [field.mul(p[0], a)]
                    for k in range(1, len(p)):
                        new_p.append(
                            field.add(field.mul(p[k], a), field.mul(p[k - 1], b))
                        )
                    new_p.append(field.mul(p[-1], b))
                    p = new_p
                mult_b = jnp.broadcast_to(
                    mults[:, prod_index : prod_index + 1], (nl, LANES)
                )
                for k, coeff in enumerate(p):
                    red = coeff
                    size = blk
                    while size > LANES:
                        half = size // 2
                        red = field.add(red[..., :half], red[..., half:])
                        size = half
                    term = field.mul(mult_b, red)
                    poly[k] = term if poly[k] is None else field.add(poly[k], term)

            @pl.when(pl.program_id(0) == 0)
            def _init():
                out_ref[:] = jnp.zeros_like(out_ref)

            for k in range(degree + 1):
                out_ref[k] = field.add(out_ref[k], poly[k])

    return body


@functools.partial(
    jax.jit, static_argnames=("field", "terms_struct", "degree", "interpret")
)
def mont_sum_round(field, lo, hi, mults, terms_struct, degree: int, interpret=False):
    """lo, hi: (nl, m, W) u32 Montgomery half-cubes (W % MONT_SUM_BLK == 0);
    mults: (nl, P). Returns (nl, degree+1) coefficient sums over all lanes."""
    nl, m, w = lo.shape
    blk = MONT_SUM_BLK
    num_p = mults.shape[1]
    out = pl.pallas_call(
        _mont_sum_body_factory(field, terms_struct, degree, blk),
        grid=(w // blk,),
        in_specs=[
            pl.BlockSpec((nl, m, blk), lambda i: (0, 0, i)),
            pl.BlockSpec((nl, m, blk), lambda i: (0, 0, i)),
            pl.BlockSpec((nl, num_p), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((degree + 1, nl, LANES), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((degree + 1, nl, LANES), jnp.uint32),
        interpret=interpret,
    )(lo, hi, mults)
    # fold the 128 residual lanes (tiny, inline XLA)
    coeffs = [field.tree_sum(out[k], LANES) for k in range(degree + 1)]
    return jnp.stack(coeffs, axis=-1)


def mont_sum_round_fits(field, m: int, w: int, degree: int) -> bool:
    vmem = (2 * m + (degree + 3)) * field.nlimbs * MONT_SUM_BLK * 4
    return (
        use_pallas()
        and w >= MONT_SUM_BLK
        and w % MONT_SUM_BLK == 0
        and vmem < (10 << 20)
    )


def _mont_fold_body_factory(field, m: int):
    from ..fields import mont as _mont

    def body(lo_ref, hi_ref, r_ref, omr_ref, out_ref):
        with _mont.diag_mode():
            # per-mle rows: Mosaic can't broadcast across sublanes AND
            # lanes in one op, so keep every operand (nl, blk)-shaped
            r_row = r_ref[:]
            omr_row = omr_ref[:]
            for t in range(m):
                out_ref[:, t] = field.add(
                    field.mul(omr_row, lo_ref[:, t]),
                    field.mul(r_row, hi_ref[:, t]),
                )

    return body


def _mont_mul_body_factory(field):
    from ..fields import mont as _mont

    def body(a_ref, b_ref, out_ref):
        with _mont.diag_mode():
            out_ref[:] = field.mul(a_ref[:], b_ref[:])

    return body


@functools.partial(jax.jit, static_argnames=("field", "interpret"))
def mont_mul_ew(field, a, b, interpret=False):
    """Elementwise Montgomery product of (nl, W) arrays (b may be (nl, 1):
    broadcast across lanes), W % MONT_SUM_BLK == 0. One VMEM-local diag-mode
    kernel per block — the inline-XLA skew multiply materializes
    (nl, nl, W) outer-product slabs in HBM per multiply, which made each
    full-width IPA round mul cost ~100 ms at 2^20."""
    nl, w = a.shape
    blk = MONT_SUM_BLK
    if b.shape[-1] == 1:
        b = jnp.broadcast_to(b, (nl, blk))
        b_spec = pl.BlockSpec((nl, blk), lambda i: (0, 0))
    else:
        b_spec = pl.BlockSpec((nl, blk), lambda i: (0, i))
    return pl.pallas_call(
        _mont_mul_body_factory(field),
        grid=(w // blk,),
        in_specs=[pl.BlockSpec((nl, blk), lambda i: (0, i)), b_spec],
        out_specs=pl.BlockSpec((nl, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nl, w), jnp.uint32),
        interpret=interpret,
    )(a, b)


def mont_mul_fits(field, w: int) -> bool:
    return (
        use_pallas()
        and w >= MONT_SUM_BLK
        and w % MONT_SUM_BLK == 0
        and 3 * field.nlimbs * MONT_SUM_BLK * 4 < (8 << 20)
    )


@functools.partial(jax.jit, static_argnames=("field", "interpret"))
def mont_fold_round(field, lo, hi, r, one_m_r, interpret=False):
    """(nl, m, W) lo/hi -> (1-r)*lo + r*hi, one fused kernel."""
    nl, m, w = lo.shape
    blk = MONT_SUM_BLK
    r_b = jnp.broadcast_to(r, (nl, blk))
    omr_b = jnp.broadcast_to(one_m_r, (nl, blk))
    return pl.pallas_call(
        _mont_fold_body_factory(field, m),
        grid=(w // blk,),
        in_specs=[
            pl.BlockSpec((nl, m, blk), lambda i: (0, 0, i)),
            pl.BlockSpec((nl, m, blk), lambda i: (0, 0, i)),
            pl.BlockSpec((nl, blk), lambda i: (0, 0)),
            pl.BlockSpec((nl, blk), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nl, m, blk), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((nl, m, w), jnp.uint32),
        interpret=interpret,
    )(lo, hi, r_b, omr_b)

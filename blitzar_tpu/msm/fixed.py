"""Fixed-generator MSM with precomputed partition tables.

TPU-native counterpart of reference sxt/multiexp/pippenger2: a handle holds,
for each group of ``window_width`` generators, all 2^w subset sums
(reference partition_table.h:36-98); a query gathers one table entry per
(output-bit, group) and reduces (reference partition_product.h:47-92), then
doubling-reduces bits into outputs (reference combine_reduce.h:40-68).

Differences from the reference, chosen for TPU:

- default ``window_width`` is 8 (not 16): the table is built by w
  subset-doubling concatenations (table_{j+1} = [table_j | table_j + G_j] —
  w batched adds instead of the reference's 2^w next_permutation walk), and a
  2^8-entry axis keeps the per-query gather slab in VMEM-friendly sizes. The
  width is configurable like the reference's BLITZAR_PARTITION_WINDOW_WIDTH.
- queries are full-width vector programs: bits are unpacked host-side to
  (rows, n) and table entries are gathered with one take_along_axis per row
  block, then tree-reduced over groups — no per-thread serial walks.

The packed and variable-length entry points (reference
sxt_fixed_packed_multiexponentiation / sxt_fixed_vlen_multiexponentiation,
blitzar_api.h:712-752) reduce to the same core: a (bit-row, n) bit matrix —
vlen just zeroes bits at positions >= the output's length, so those groups
index table entry 0 = identity.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..curves import edwards25519 as ed
from ..fields import fp25519 as F25519


def _table_dtype():
    """bf16 on TPU (exact for byte values < 256, feeds the MXU); f32 on CPU —
    this host's XLA:CPU thunk runtime cannot execute batched bf16 dots
    ("Unsupported element type for DotThunk"), and f32 is exact for bytes
    anyway. Both are bit-identical through the integer reconstruction."""
    from ..utils.backend import compute_platform

    return jnp.bfloat16 if compute_platform() == "tpu" else jnp.float32


def default_window_width() -> int:
    """Reference pippenger2/window_width.cc:30-56 (env-overridable)."""
    v = os.environ.get("BLITZAR_TPU_PARTITION_WINDOW_WIDTH")
    return int(v) if v else 8


def _split_l(curve) -> int:
    """Per-entry value count L of the byte-split table (niels triple for
    curve25519, projective coords for Weierstrass)."""
    return (3 if curve is ed else curve.coord_count) * curve.nlimbs


def auto_window_width(n: int, curve=ed) -> int:
    """Largest window (<= the default) whose split table fits the HBM budget.

    A w=8 table at n=2^20 is 2L*(2^8/8)*n values — 6.4 GB for curve25519
    (L=48 bf16), 9.7 GB for bls12-381 (L=72). The reference sizes its window
    by env only (pippenger2/window_width.cc:30-56) and streams table slices
    from host RAM; here the table is device-resident, so the width must
    respect device memory (the 10 GB default leaves query headroom on a
    16 GB chip). Env overrides: BLITZAR_TPU_PARTITION_WINDOW_WIDTH pins the
    width exactly; BLITZAR_TPU_TABLE_BUDGET_BYTES moves the budget."""
    v = os.environ.get("BLITZAR_TPU_PARTITION_WINDOW_WIDTH")
    if v:
        return int(v)
    budget = int(os.environ.get("BLITZAR_TPU_TABLE_BUDGET_BYTES", str(10 << 30)))
    from ..utils.backend import compute_platform

    itemsize = 2 if compute_platform() == "tpu" else 4
    w = 8
    while w > 4 and (max(n, 1) / w) * (1 << w) * 2 * _split_l(curve) * itemsize > budget:
        w //= 2
    return w


# group-chunk size for table building: bounds XLA temp memory (the
# subset-doubling concats hold several copies of the chunk's table in
# flight; small chunks keep the build program's peak near the output size)
BUILD_CHUNK_GROUPS = 1 << 12

# split tables are stored pre-chunked as (nc, L, gc, V) so queries can
# lax.map over the leading axis with zero-copy slicing
TABLE_CHUNK_GROUPS = 1 << 10


def _table_chunk_groups(groups: int) -> int:
    gc = min(TABLE_CHUNK_GROUPS, groups)
    p2 = 1 << (gc.bit_length() - 1)
    while p2 > 1 and groups % p2:
        p2 //= 2
    if p2 > 1:
        return p2
    while groups % gc:
        gc -= 1
    return gc


@functools.partial(jax.jit, static_argnames=("window_width", "curve"))
def _build_table(points, window_width: int, curve=ed):
    """points: (n,) batch, n a multiple of window_width ->
    (num_groups, 2^w) partition table: table[g, v] = sum_{j: bit j of v}
    points[g*w + j] (built by w subset-doubling steps,
    table_{j+1} = [table_j | table_j + G_j])."""
    n = points.x.shape[-1]
    groups = n // window_width
    pts = curve.reshape_batch(points, (groups, window_width))

    def build_chunk(chunk_pts):
        table = curve.identity((chunk_pts[0].shape[1], 1))
        chunk = curve.make_point(*chunk_pts)
        for j in range(window_width):
            gj = curve.index_batch(chunk, (slice(None), j))
            # broadcast the generator to the table's shape BEFORE the add so
            # the equal-shape Pallas kernel handles it (a broadcast add would
            # silently fall back to the slow inline-XLA formulas)
            gj_b = curve.make_point(
                *(
                    jnp.broadcast_to(c[..., None], tc.shape)
                    for c, tc in zip(gj, table)
                )
            )
            shifted = curve.add(table, gj_b)
            table = curve.make_point(
                *(
                    jnp.concatenate([tc, sc], axis=-1)
                    for tc, sc in zip(table, shifted)
                )
            )
        return jnp.stack(list(table))  # (coords, nlimbs, gc, V)

    gc = min(BUILD_CHUNK_GROUPS, groups)
    while groups % gc:
        gc -= 1
    nchunks = groups // gc
    if nchunks == 1:
        out = build_chunk([c for c in pts])
        return curve.make_point(*out)
    chunked = [
        c.reshape(curve.nlimbs, nchunks, gc, window_width).swapaxes(0, 1)
        for c in pts
    ]
    out = lax.map(build_chunk, chunked)  # (nchunks, coords, nlimbs, gc, V)
    v = out.shape[-1]
    merged = [
        jnp.moveaxis(out[:, k], 0, 1).reshape(curve.nlimbs, groups, v)
        for k in range(curve.coord_count)
    ]
    return curve.make_point(*merged)


def _fmul(a, b):
    """Field multiply routed through the Pallas elementwise kernel on TPU
    (one inline-XLA multiply materializes a 16x-operand-size outer product
    in HBM — ruinous in the mul-heavy build/normalization code below)."""
    from ..ops import pallas_point as pp

    lanes = 1
    for d in a.shape[1:]:
        lanes *= int(d)
    if pp.use_pallas() and a.shape == b.shape and lanes > 0:
        return pp.fmul(a, b)
    return F25519.mul(a, b)


def _finvert(a):
    """Batched field inversion; single fused kernel on TPU."""
    from ..ops import pallas_point as pp

    if not pp.use_pallas():
        return F25519.invert(a)
    return pp.finvert(a)


def _batch_invert_lanes(z):
    """Montgomery-trick batch inversion along the LAST axis: one field
    inversion per leading-batch row + O(log V) full-width muls (the scans)."""
    axis = z.ndim - 1
    prefix = lax.associative_scan(_fmul, z, axis=axis)
    suffix = lax.associative_scan(_fmul, z, axis=axis, reverse=True)
    total_inv = _finvert(prefix[..., -1:])
    ones = F25519.from_int_const(1, z.shape[1:-1] + (1,))
    p_exc = jnp.concatenate([ones, prefix[..., :-1]], axis=-1)
    s_exc = jnp.concatenate([suffix[..., 1:], ones], axis=-1)
    return _fmul(_fmul(p_exc, s_exc), total_inv)


def _ed_niels_split(table: "ed.PointP3"):
    """Extended table batch (.., V) -> byte-split niels storage
    (.., 96, V): axis -2 is [a | b | 2d*t] x 16 limbs, low bytes then high
    bytes; the table-entry axis V rides the vector lanes. Storing the
    affine (y+x, y-x, 2d*xy) triple instead of projective (x, y, z, t)
    drops table memory and lookup-matmul work by 25% and makes every
    accumulation a 7-mul mixed add (curves/edwards25519.py,
    ops/pallas_point.py ed_lookup_msm)."""
    zinv = _batch_invert_lanes(table.z)
    xa = _fmul(table.x, zinv)
    ya = _fmul(table.y, zinv)
    a = F25519.add(ya, xa)
    b = F25519.sub(ya, xa)
    d2 = F25519.from_int_const(ed.D2_INT, xa.shape[1:])
    t = _fmul(_fmul(xa, ya), d2)
    full = jnp.concatenate(
        [jnp.moveaxis(c, 0, -2) for c in (a, b, t)], axis=-2
    )  # (.., 48, V)
    dt = _table_dtype()
    return jnp.concatenate(
        [(full & jnp.uint32(0xFF)).astype(dt), (full >> 8).astype(dt)],
        axis=-2,
    )


def _ed_cached_split(table: "ed.PointP3"):
    """Extended table batch (.., V) -> byte-split CACHED storage
    (.., 128, V): axis -2 is [y+x | y-x | z | 2d*t] x 16 limbs, low bytes
    then high bytes. No inversion — two adds and a const-mul per entry —
    so this is the form for streamed build-per-query tables
    (curves/edwards25519.py Cached)."""
    c = ed.to_cached(table)
    full = jnp.concatenate(
        [jnp.moveaxis(x, 0, -2) for x in (c.a, c.b, c.z, c.t)], axis=-2
    )  # (.., 64, V)
    dt = _table_dtype()
    return jnp.concatenate(
        [(full & jnp.uint32(0xFF)).astype(dt), (full >> 8).astype(dt)],
        axis=-2,
    )


def _w_split(table, curve):
    """Weierstrass storage: projective coords byte-split, (.., 2L, V).
    (Affine + marker is not usable here: the complete projective formulas
    need z, and the identity entry has z = 0.)"""
    full = jnp.concatenate(
        [jnp.moveaxis(c, 0, -2) for c in table], axis=-2
    )  # (.., L, V)
    dt = _table_dtype()
    return jnp.concatenate(
        [(full & jnp.uint32(0xFF)).astype(dt), (full >> 8).astype(dt)],
        axis=-2,
    )


def _split_any(table, curve, form: str = "niels"):
    if curve is not ed:
        return _w_split(table, curve)
    return _ed_cached_split(table) if form == "cached" else _ed_niels_split(table)


def _build_split_table(points, window_width: int, curve=ed, form: str = "niels"):
    """Build the byte-split partition table, returned as (nc, gc, 2L, V)
    (L = 48 niels values for ed, coord_count*nlimbs for Weierstrass),
    pre-chunked on the leading axis (queries lax.map over it with zero-copy
    slicing).

    Fast path (TPU): ONE fused Pallas kernel (ops/pallas_point.py
    build_split_table) — subset-doubling, niels batch inversion, and the
    byte split all happen per group tile in VMEM; the uint32 point table
    never exists. This is what makes sxt_multiexp_handle_new deployable
    (the round-1 lax.map-of-chunks build measured 558 s at 2^20/w=8).

    Fallback (CPU / odd shapes): the chunked XLA build below."""
    from ..ops import pallas_point as pp

    n = points.x.shape[-1]
    groups = n // window_width
    if pp.use_pallas() and pp.build_split_fits(groups, window_width):
        gc = _table_chunk_groups(groups)
        if gc % pp._build_bg(window_width) == 0:
            return _build_split_pallas(points, window_width, curve, form, gc)
        split = pp.build_split_table(
            points, window_width, curve, form, _table_dtype()
        )  # (G, 2L, V)
        return split.reshape(groups // gc, gc, split.shape[-2], split.shape[-1])
    return _build_split_table_xla(points, window_width, curve, form)


@functools.partial(
    jax.jit, static_argnames=("window_width", "curve", "form", "gc")
)
def _build_split_pallas(points, window_width: int, curve, form: str, gc: int):
    """Chunked fused-Pallas build: lax.map over group chunks, each chunk one
    pallas_call, results written straight into the pre-chunked (nc, gc, 2L, V)
    table. Chunking matters for memory layout, not just peak scratch: the
    kernel's (nl, groups, w) input blocks pad the minor w axis to the 128-lane
    tile (16x HBM blowup at w=8, 32x at w=4 — enough to OOM the chip when
    built whole at 2^20 for the 24-limb fields). Feeding the kernel flat
    (nl, gc*w) chunk slices keeps the padded form chunk-sized and transient."""
    from ..ops import pallas_point as pp

    w = window_width
    nl = curve.nlimbs
    n = points.x.shape[-1]
    groups = n // w
    nc = groups // gc
    dt = _table_dtype()
    coords = [c.reshape(nl, nc, gc * w).swapaxes(0, 1) for c in points]

    def chunk(cs):
        cl = [c.reshape(nl, gc, w) for c in cs]
        return pp._build_split_tiled(cl, curve, w, form, dt, False)  # (gc,2L,V)

    if nc == 1:
        return chunk([c[0] for c in coords])[None]
    return lax.map(chunk, coords)  # (nc, gc, 2L, V)


@functools.partial(jax.jit, static_argnames=("window_width", "curve", "form"))
def _build_split_table_xla(points, window_width: int, curve=ed, form: str = "niels"):
    """Chunked XLA build (each group chunk built then immediately split, so
    the full uint32 point table is never materialized)."""
    n = points.x.shape[-1]
    groups = n // window_width
    pts = curve.reshape_batch(points, (groups, window_width))
    nl = curve.nlimbs

    def build_chunk(chunk_pts):
        gc_local = chunk_pts[0].shape[1]
        table = curve.identity((gc_local, 1))
        chunk = curve.make_point(*chunk_pts)
        for j in range(window_width):
            gj = curve.index_batch(chunk, (slice(None), j))
            # broadcast the generator to the table's shape BEFORE the add so
            # the equal-shape Pallas kernel handles it (a broadcast add would
            # silently fall back to the slow inline-XLA formulas)
            gj_b = curve.make_point(
                *(
                    jnp.broadcast_to(c[..., None], tc.shape)
                    for c, tc in zip(gj, table)
                )
            )
            shifted = curve.add(table, gj_b)
            table = curve.make_point(
                *(
                    jnp.concatenate([tc, sc], axis=-1)
                    for tc, sc in zip(table, shifted)
                )
            )
        return _split_any(curve.make_point(*table), curve, form)

    gc = _table_chunk_groups(groups)
    nchunks = groups // gc
    if nchunks == 1:
        return build_chunk([c for c in pts])[None]
    chunked = [
        c.reshape(nl, nchunks, gc, window_width).swapaxes(0, 1) for c in pts
    ]
    return lax.map(build_chunk, chunked)  # (nchunks, gc, 2L, V)


def _handle_n_pad(n: int, w: int, curve) -> int:
    """The padded point count MultiexpHandle will use for (n, w, curve)."""
    from ..ops import pallas_point as pp

    n_pad = -(-max(n, 1) // w) * w
    if pp.use_pallas() and w <= 8:
        tile = w * pp._build_bg(w)
        n_pad = -(-n_pad // tile) * tile
    return n_pad


class MultiexpHandle:
    """Reference sxt_multiexp_handle (blitzar_api.h:184, multiexp_handle.h):
    precomputed partition tables for a fixed generator sequence."""

    def __init__(self, points, window_width: int | None = None, curve=ed, n: int | None = None):
        self.curve = curve
        self.n = int(n if n is not None else points.x.shape[-1])
        self.window_width = int(window_width or auto_window_width(self.n, curve))
        w = self.window_width
        # pad to the window and (on TPU) to the fused build kernel's tile —
        # identity padding is free at query time: padded scalars are zero ->
        # table entry 0
        n_pad = _handle_n_pad(self.n, w, curve)
        if points.x.shape[-1] < n_pad:
            pad = curve.identity((n_pad - points.x.shape[-1],))
            points = curve.make_point(
                *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(points, pad))
            )
        self.num_groups = n_pad // w
        self.t_split = _build_split_table(points, w, curve)  # (nc, gc, 2L, V)
        # the uint32 point table is reconstructed on demand (write_to_file)
        self.table = None

    # -- serialization (reference in_memory_partition_table_accessor.h:42-64:
    # window_width header + raw table; ours is an npz with the same content) --

    def _point_table(self):
        if self.table is not None:
            return self.table
        curve = self.curve
        nl = curve.nlimbs
        ts = jnp.asarray(self.t_split)
        l_dim = ts.shape[-2] // 2
        full = ts[..., :l_dim, :].astype(jnp.uint32) | (
            ts[..., l_dim:, :].astype(jnp.uint32) << 8
        )  # (nc, gc, L, V)
        nc, gc, _, v = full.shape
        flat = full.reshape(nc * gc, l_dim, v)  # (G, L, V)
        if curve is ed:
            a, b, t = (
                jnp.moveaxis(flat[:, k * nl : (k + 1) * nl, :], 1, 0)
                for k in range(3)
            )
            return ed.niels_to_p3(ed.Niels(a, b, t))
        return curve.make_point(
            *(
                jnp.moveaxis(flat[:, k * nl : (k + 1) * nl, :], 1, 0)
                for k in range(curve.coord_count)
            )
        )

    def write_to_file(self, path: str) -> None:
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            curve=self.curve.name,
            window_width=self.window_width,
            n=self.n,
            **{f"coord{i}": np.asarray(c) for i, c in enumerate(self._point_table())},
        )

    @classmethod
    def new_from_file(cls, path: str, curve=ed) -> "MultiexpHandle":
        # accept both our npz format and the reference's raw format
        # (sniffed by the zip magic): sxt_multiexp_handle_new_from_file
        # must load files written by the reference's app/blitzar CLI
        if os.path.exists(path) and not path.endswith(".npz"):
            with open(path, "rb") as f:
                if f.read(2) != b"PK":
                    from . import interop

                    return interop.read_reference_file(path, curve)
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        assert str(data["curve"]) == curve.name, (
            f"file curve {data['curve']} != requested {curve.name}"
        )
        obj = cls.__new__(cls)
        obj.curve = curve
        obj.window_width = int(data["window_width"])
        obj.n = int(data["n"])
        obj.table = curve.make_point(
            *(jnp.asarray(data[f"coord{i}"]) for i in range(curve.coord_count))
        )
        obj.num_groups = obj.table.x.shape[-2]
        obj.t_split = _split_table(obj.table, curve)
        return obj


@functools.partial(jax.jit, static_argnames=("curve",))
def _split_table_jit(table, curve):
    """Point table (coords of (nlimbs, G, V) uint32) -> one tensor of shape
    (nc, gc, 2L, V), pre-chunked leading axis, holding the low then high
    bytes of each stored value (niels triple for ed, projective coords for
    Weierstrass). bf16 on TPU / f32 on CPU — both represent ints < 256
    exactly, which is what makes the one-hot-matmul lookup exact."""
    split = _split_any(table, curve)  # (G, 2L, V)
    groups, l2, v = split.shape
    gc = _table_chunk_groups(groups)
    return split.reshape(groups // gc, gc, l2, v)


def _split_table(table, curve):
    return _split_table_jit(table, curve)


# soft cap on the materialized one-hot tensor, in bytes
ONEHOT_BUDGET_BYTES = 128 << 20


@functools.partial(jax.jit, static_argnames=("window_width", "curve"))
def _partition_products(t_split, bit_rows, window_width: int, curve=ed):
    """t_split: (nc, gc, 2L, 2^w) byte-split table (pre-chunked; low bytes
    then high bytes along axis -2); bit_rows: (R, G*w) uint8 in {0, 1},
    G = nc*gc. Returns (R,) points:
    sum_g table[g, pack(bits[r, g*w:(g+1)*w])].

    Fast path (TPU, curve25519): pp.ed_lookup_msm — ONE fused Pallas kernel
    whose grid streams table tiles through VMEM, forms the one-hot there,
    looks entries up on the MXU, and accumulates with 7-mul mixed adds.
    The one-hot and the selected entries never touch HBM, which is what the
    XLA fallback below pays for (its materialized one-hot is the dominant
    HBM traffic of the whole query).

    Fallback (CPU / Weierstrass / odd shapes): one-hot einsum
    ('rgv,glv->rgl') per table chunk — still no XLA gather (measured ~50x
    slower on TPU). Rows are sub-blocked so the one-hot stays under
    ONEHOT_BUDGET_BYTES (row blocks are a small static python loop — nesting
    lax.map around the Pallas kernels crashes the worker)."""
    r_rows, n = bit_rows.shape
    nc, gc, l2, v = t_split.shape
    l_dim = l2 // 2
    groups = nc * gc
    assert groups * window_width == n
    nlimbs = curve.nlimbs
    weights = (1 << np.arange(window_width, dtype=np.int32))[None, None, :]
    idx = jnp.sum(
        bit_rows.reshape(r_rows, groups, window_width).astype(jnp.int32)
        * jnp.asarray(weights),
        axis=-1,
    )  # (R, G)

    from ..ops import pallas_point as pp

    if curve is ed and pp.use_pallas() and pp.lookup_msm_fits(groups, v, r_rows):
        return pp.ed_lookup_msm(t_split.reshape(groups, l2, v), idx)
    if (
        curve is not ed
        and pp.use_pallas()
        and pp.w_lookup_msm_fits(groups, v, r_rows)
    ):
        return pp.w_lookup_msm(curve, t_split.reshape(groups, l2, v), idx)

    rb = max(1, ONEHOT_BUDGET_BYTES // (gc * v * 2))
    rb = min(rb, r_rows)
    r_pad = -(-r_rows // rb) * rb
    if r_pad != r_rows:
        idx = jnp.pad(idx, ((0, r_pad - r_rows), (0, 0)))
    nrb = r_pad // rb

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (rb, gc, v), 2)
    # (nrb, nc, rb, gc): row-block-major, then chunk
    idx_blocks = idx.reshape(nrb, rb, nc, gc).swapaxes(1, 2)

    def chunk(args):
        ts_c, idx_c = args  # lax.map slices t_split's leading axis: no copy
        onehot = (idx_c[:, :, None] == iota_v).astype(ts_c.dtype)
        sel2 = jnp.einsum(
            "rgv,glv->rgl", onehot, ts_c, preferred_element_type=jnp.float32
        )
        sel = sel2[..., :l_dim].astype(jnp.uint32) | (
            sel2[..., l_dim:].astype(jnp.uint32) << 8
        )
        if curve is ed and l_dim == 3 * nlimbs:
            a, b, t = (
                jnp.moveaxis(sel[..., k * nlimbs : (k + 1) * nlimbs], -1, 0)
                for k in range(3)
            )
            niels = ed.Niels(a, b, t)  # (nlimbs, rb, gc)
            if pp.use_pallas() and pp.tree_fits(curve, gc):
                red = pp.niels_tree_reduce_lanes(niels, gc)
            elif gc % 2 == 0:
                half = gc // 2
                n1 = ed.Niels(*(c[:, :, :half] for c in niels))
                n2 = ed.Niels(*(c[:, :, half:] for c in niels))
                red = curve.tree_reduce(ed.niels_add(n1, n2), half)
            else:
                red = curve.tree_reduce(ed.niels_to_p3(niels), gc)
        elif curve is ed:  # cached (projective) form, l_dim == 4 * nlimbs
            a, b, z, t = (
                jnp.moveaxis(sel[..., k * nlimbs : (k + 1) * nlimbs], -1, 0)
                for k in range(4)
            )
            pts = ed.cached_to_p3(ed.Cached(a, b, z, t))
            if pp.use_pallas() and pp.tree_fits(curve, gc):
                red = pp.tree_reduce_lanes(curve, pts, gc)
            else:
                red = curve.tree_reduce(pts, gc)
        else:
            coords = [
                jnp.moveaxis(sel[..., k * nlimbs : (k + 1) * nlimbs], -1, 0)
                for k in range(curve.coord_count)
            ]
            pts = curve.make_point(*coords)  # (nlimbs, rb, gc)
            if pp.use_pallas() and pp.tree_fits(curve, gc):
                red = pp.tree_reduce_lanes(curve, pts, gc)  # one fused kernel
            else:
                red = curve.tree_reduce(pts, gc)  # (rb,)
        return jnp.stack(list(red))  # (coords, nlimbs, rb)

    row_results = []
    for rbi in range(nrb):  # small static count; keeps lax.map un-nested
        out = lax.map(chunk, (t_split, idx_blocks[rbi]))  # (nc, coords, nl, rb)
        parts = curve.make_point(
            *(jnp.moveaxis(out[:, k], 0, -1) for k in range(curve.coord_count))
        )  # batch (rb, nc)
        row_results.append(curve.tree_reduce(parts, nc))  # (rb,)
    if nrb == 1:
        total = row_results[0]
    else:
        total = curve.make_point(
            *(jnp.concatenate(cs, axis=-1) for cs in zip(*row_results))
        )
    return curve.index_batch(total, (slice(0, r_rows),))


@functools.partial(jax.jit, static_argnames=("num_bits", "curve"))
def _doubling_combine(products, num_bits: int, curve=ed):
    """(O, num_bits) bit products -> (O,): sum_b 2^b * products[:, b]
    (reference pippenger2/reduce.h:37-48). On TPU (curve25519) the whole
    ladder runs inside one Pallas kernel — its widths are tiny, so dispatch
    overhead would otherwise dominate."""
    from ..ops import pallas_point as pp

    o = products.x.shape[1]
    if (
        curve is ed
        and pp.use_pallas()
        and num_bits > 1
        and pp.combine_fits(o, num_bits)
    ):
        return pp.doubling_combine(products, num_bits)
    acc = curve.make_point(*(c[:, :, num_bits - 1] for c in products))
    if num_bits == 1:
        return acc

    def step(i, acc):
        acc = curve.double(acc)
        b = num_bits - 2 - i
        row = curve.make_point(
            *(lax.dynamic_index_in_dim(c, b, axis=2, keepdims=False) for c in products)
        )
        return curve.add(acc, row)

    return lax.fori_loop(0, num_bits - 1, step, acc)


def _bits_from_bytes(scalars: np.ndarray) -> np.ndarray:
    """(O, n, nbytes) uint8 -> (O, 8*nbytes, n) bit rows (LSB-first)."""
    o, n, nbytes = scalars.shape
    bits = np.unpackbits(scalars, axis=-1, bitorder="little")  # (O, n, 8*nbytes)
    return np.transpose(bits, (0, 2, 1))


@functools.partial(
    jax.jit, static_argnames=("window_width", "num_outputs", "nbits", "curve")
)
def _query_jit(t_split, scalars_dev, window_width, num_outputs, nbits, curve):
    """One fused device program: unpack scalar bytes to bit rows, run the
    one-hot-matmul partition products, doubling-combine bits into outputs.
    Keeping the unpack on device means the host uploads only the raw scalar
    bytes (the bit matrix is 8x bigger — that matters across a slow link)."""
    o, n_table, nbytes = scalars_dev.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, None, :]
    bits = (scalars_dev[:, :, :, None] >> shifts) & jnp.uint8(1)  # (O,n,nb,8)
    rows = bits.reshape(o, n_table, nbits).transpose(0, 2, 1).reshape(
        o * nbits, n_table
    )
    products = _partition_products(t_split, rows, window_width, curve)
    products = curve.reshape_batch(products, (num_outputs, nbits))
    return _doubling_combine(products, nbits, curve)


@functools.partial(
    jax.jit, static_argnames=("window_width", "num_outputs", "nbits", "curve")
)
def _query_signed_jit(
    t_split, scalars_dev, signs_dev, window_width, num_outputs, nbits, curve
):
    """Signed fixed-MSM query: per-element signs expressed IN the partition
    engine — positive and negative bit-row masks against the same table,
    result = Q_pos - Q_neg (two row blocks, one table pass). This keeps
    Proof-of-SQL-shaped signed workloads on the fast path instead of the
    sort-based bucket engine (reference handles signs with a sign bit on the
    gather index + cneg, multiexp/curve/multiproduct.h:32-58).

    scalars_dev: (O, n, nbytes) uint8 MAGNITUDES; signs_dev: (O, n) uint8,
    1 = negate that element's contribution."""
    o, n_table, nbytes = scalars_dev.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, None, :]
    bits = (scalars_dev[:, :, :, None] >> shifts) & jnp.uint8(1)  # (O,n,nb,8)
    rows = bits.reshape(o, n_table, nbits).transpose(0, 2, 1)  # (O, nbits, n)
    neg = (signs_dev == 1)[:, None, :]  # (O, 1, n)
    rows_pos = jnp.where(neg, jnp.uint8(0), rows)
    rows_neg = jnp.where(neg, rows, jnp.uint8(0))
    all_rows = jnp.concatenate([rows_pos, rows_neg]).reshape(
        2 * o * nbits, n_table
    )
    products = _partition_products(t_split, all_rows, window_width, curve)
    p_pos = curve.reshape_batch(
        curve.index_batch(products, (slice(0, o * nbits),)), (o, nbits)
    )
    p_neg = curve.reshape_batch(
        curve.index_batch(products, (slice(o * nbits, 2 * o * nbits),)), (o, nbits)
    )
    q_pos = _doubling_combine(p_pos, nbits, curve)
    q_neg = _doubling_combine(p_neg, nbits, curve)
    return curve.add(q_pos, curve.neg(q_neg))


def fixed_multiexponentiation_signed(
    handle: MultiexpHandle, scalars, signs
) -> "ed.PointP3":
    """scalars: (O, n, nbytes) uint8 magnitudes; signs: (O, n) uint8."""
    curve = handle.curve
    scalars = np.asarray(scalars, np.uint8)
    signs = np.asarray(signs, np.uint8)
    num_outputs, n, nbytes = scalars.shape
    assert n <= handle.n
    if num_outputs == 0:
        return curve.identity((0,))
    n_table = handle.num_groups * handle.window_width
    if n < n_table:
        scalars = np.pad(scalars, ((0, 0), (0, n_table - n), (0, 0)))
        signs = np.pad(signs, ((0, 0), (0, n_table - n)))
    return _query_signed_jit(
        handle.t_split, jnp.asarray(scalars), jnp.asarray(signs),
        handle.window_width, num_outputs, 8 * nbytes, curve,
    )


# points per streamed chunk (table slab = chunk * 32 niels entries, ~800MB
# at 2^18). Large chunks amortize the host-side dispatch overhead of the
# per-chunk jit call — the 1-core host is the bottleneck at small chunks.
STREAM_CHUNK_POINTS = 1 << 18


@functools.partial(
    jax.jit,
    static_argnames=("window_width", "num_outputs", "nbits", "curve", "signed"),
)
def _stream_chunk_jit(
    point_coords, scal, signs, window_width, num_outputs, nbits, curve,
    signed=False,
):
    """One streamed chunk: build the chunk's partition table, query it,
    return the (coords, nlimbs, R) partial products (R doubles when signed:
    positive rows then negative rows). Compiled once — every chunk has the
    same shape."""
    o, chunk_n, nbytes = scal.shape
    # cached (projective) entries: the streamed build runs once per query,
    # so the niels form's batch inversion would dominate; cached entries
    # cost two adds to build and one extra mul per accumulation
    form = "cached" if curve is ed else "niels"
    t_split = _build_split_table(
        curve.make_point(*point_coords), window_width, curve, form
    )
    shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, None, :]
    bits = (scal[:, :, :, None] >> shifts) & jnp.uint8(1)
    rows = bits.reshape(o, chunk_n, nbits).transpose(0, 2, 1)  # (O, nbits, n)
    if signed:
        neg = (signs == 1)[:, None, :]
        rows = jnp.concatenate(
            [
                jnp.where(neg, jnp.uint8(0), rows),
                jnp.where(neg, rows, jnp.uint8(0)),
            ]
        )  # (2*O, nbits, n)
    rows = rows.reshape(-1, chunk_n)
    products = _partition_products(t_split, rows, window_width, curve)
    return jnp.stack(list(products))  # (coords, nlimbs, R)


@functools.partial(
    jax.jit, static_argnames=("num_outputs", "nbits", "curve", "signed")
)
def _stream_combine_jit(parts, num_outputs, nbits, curve, signed=False):
    """(nchunks, coords, nlimbs, R) partials -> (num_outputs,) points."""
    nchunks = parts.shape[0]
    total = curve.tree_reduce(
        curve.make_point(
            *(jnp.moveaxis(parts[:, k], 0, -1) for k in range(curve.coord_count))
        ),
        nchunks,
    )
    if signed:
        p_pos = curve.reshape_batch(
            curve.index_batch(total, (slice(0, num_outputs * nbits),)),
            (num_outputs, nbits),
        )
        p_neg = curve.reshape_batch(
            curve.index_batch(
                total, (slice(num_outputs * nbits, 2 * num_outputs * nbits),)
            ),
            (num_outputs, nbits),
        )
        return curve.add(
            _doubling_combine(p_pos, nbits, curve),
            curve.neg(_doubling_combine(p_neg, nbits, curve)),
        )
    prods = curve.reshape_batch(total, (num_outputs, nbits))
    return _doubling_combine(prods, nbits, curve)


def _streaming_query_jit(
    point_coords, scalars_dev, signs_dev, window_width, num_outputs, nbits,
    curve, signed=False,
):
    """Fused build+query streamed over generator chunks: each chunk's
    partition table is built, queried, and discarded — memory stays bounded
    by the chunk slab regardless of n (the TPU shape of the reference's
    table-slice streaming, reference pippenger2/partition_product.h:128-135).
    point_coords: list of (nlimbs, n) arrays; scalars_dev: (O, n, nbytes).

    The chunk loop is HOST-driven: each chunk dispatches the same compiled
    program asynchronously. Wrapping the Pallas lookup kernel in lax.map
    hard-crashes the TPU worker, and a host loop pipelines just as well —
    dispatch overhead is hidden behind the previous chunk's execution."""
    o, n, nbytes = scalars_dev.shape
    w = window_width
    chunk_n = min(STREAM_CHUNK_POINTS, n)
    while n % chunk_n:
        chunk_n //= 2
    nchunks = n // chunk_n
    scalars_dev = jnp.asarray(scalars_dev)
    point_coords = [jnp.asarray(c) for c in point_coords]
    parts = []
    for ci in range(nchunks):
        sl = slice(ci * chunk_n, (ci + 1) * chunk_n)
        pts = [c[:, sl] for c in point_coords]
        scal = scalars_dev[:, sl]
        sg = signs_dev[:, sl] if signed else jnp.zeros((o, chunk_n), jnp.uint8)
        parts.append(
            _stream_chunk_jit(
                pts, scal, sg, w, num_outputs, nbits, curve, signed
            )
        )
    stacked = parts[0][None] if nchunks == 1 else jnp.stack(parts)
    return _stream_combine_jit(stacked, num_outputs, nbits, curve, signed)


def streaming_multiexponentiation(
    points, scalars, curve=ed, window_width=8, signs=None
):
    """Dynamic MSM for very large n: scalars (O, n, nbytes) uint8 magnitudes
    (with optional per-element signs (O, n), 1 = negate); points (>= n,).
    No persistent table — build+query streamed per chunk."""
    scalars = np.asarray(scalars, np.uint8)
    num_outputs, n, nbytes = scalars.shape
    w = window_width
    n_pad = -(-n // w) * w
    signed = signs is not None
    if signed:
        signs = np.asarray(signs, np.uint8)
        if signs.shape[1] < n_pad:
            signs = np.pad(signs, ((0, 0), (0, n_pad - signs.shape[1])))
    if scalars.shape[1] < n_pad:
        scalars = np.pad(scalars, ((0, 0), (0, n_pad - n), (0, 0)))
    npts = points.x.shape[-1]
    if npts < n_pad:
        pad = curve.identity((n_pad - npts,))
        points = curve.make_point(
            *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(points, pad))
        )
    elif npts > n_pad:
        points = curve.index_batch(points, (slice(0, n_pad),))
    return _streaming_query_jit(
        list(points),
        jnp.asarray(scalars),
        jnp.asarray(signs) if signed else None,
        w,
        num_outputs,
        8 * nbytes,
        curve,
        signed,
    )


def fixed_multiexponentiation(handle: MultiexpHandle, scalars) -> "ed.PointP3":
    """scalars: (num_outputs, n, element_num_bytes) uint8 -> (num_outputs,)
    points (reference sxt_fixed_multiexponentiation, blitzar_api.h:685)."""
    curve = handle.curve
    scalars = np.asarray(scalars, np.uint8)
    num_outputs, n, nbytes = scalars.shape
    assert n <= handle.n, f"scalar length {n} exceeds handle size {handle.n}"
    if num_outputs == 0:
        return curve.identity((0,))
    n_table = handle.num_groups * handle.window_width
    if n < n_table:
        scalars = np.pad(scalars, ((0, 0), (0, n_table - n), (0, 0)))
    return _query_jit(
        handle.t_split, jnp.asarray(scalars), handle.window_width,
        num_outputs, 8 * nbytes, curve,
    )


def _record_with_result(handle, name, result, **arrays):
    """Dump inputs + accessor + result for offline replay (reference
    gpu_backend.cc:286-301 + multiexponentiation_serialization.h:71-93: the
    reference writes accessor, bit table, scalars, and result). Replay with
    ``python -m blitzar_tpu.cli replay <dir>``."""
    from ..utils import recorder

    path = recorder.new_record_dir(name)
    if path is None:
        return
    import os

    recorder.write_arrays(
        path,
        **arrays,
        window_width=np.asarray(handle.window_width, np.uint32),
        **{
            f"result{i}": np.asarray(c)
            for i, c in enumerate(result)
        },
    )
    handle.write_to_file(os.path.join(path, "accessor"))


@functools.partial(
    jax.jit, static_argnames=("bit_table", "window_width", "curve", "masked")
)
def _packed_query_jit(
    t_split, packed_dev, lengths_dev, bit_table: tuple, window_width: int,
    curve, masked: bool,
):
    """Packed/vlen fixed-MSM query as ONE device program.

    packed_dev: (n_table, num_bytes) uint8 column-major packed scalar bytes
    (reference blitzar_api.h:712-733); lengths_dev: (num_outputs,) int32
    per-output generator counts (vlen; ignored unless ``masked``). The bit
    unpack, the vlen length masking, the per-output row blocking, the
    partition products, and every output's doubling ladder run on device —
    the host uploads only the packed bytes. (The previous host-side unpack
    shipped the 8x-larger bit matrix through the link — 336 MB vs 42 MB for
    10x32-bit outputs at 2^20 — and dispatched each output's combine
    separately; that transfer dominated the vlen benchmark.)

    Short outputs are padded with zero rows up to max(bit_table): zero bit
    rows select table entry 0 = identity, and identity rows at high ladder
    bits contribute nothing, so one batched (O, max_bits) combine is exact.
    """
    n_table, num_bytes = packed_dev.shape
    bit_sum = int(sum(bit_table))
    num_outputs = len(bit_table)
    maxb = max(bit_table)
    shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, :]
    bits = ((packed_dev[:, :, None] >> shifts) & jnp.uint8(1)).reshape(
        n_table, num_bytes * 8
    )
    rows = bits[:, :bit_sum].T  # (bit_sum, n_table)
    col = jnp.arange(n_table, dtype=jnp.int32)[None, :]
    blocks = []
    start = 0
    for o, nb in enumerate(bit_table):
        blk = rows[start : start + nb]
        if masked:
            blk = jnp.where(col < lengths_dev[o], blk, jnp.uint8(0))
        if nb < maxb:
            blk = jnp.pad(blk, ((0, maxb - nb), (0, 0)))
        blocks.append(blk)
        start += nb
    all_rows = jnp.concatenate(blocks).reshape(num_outputs * maxb, n_table)
    products = _partition_products(t_split, all_rows, window_width, curve)
    prods = curve.reshape_batch(products, (num_outputs, maxb))
    return _doubling_combine(prods, maxb, curve)


def _packed_query(handle, output_bit_table, n, scalars, output_lengths=None):
    curve = handle.curve
    if not output_bit_table:
        return curve.identity((0,))
    bit_sum = int(sum(output_bit_table))
    num_bytes = -(-bit_sum // 8)
    n_table = handle.num_groups * handle.window_width
    packed = np.asarray(scalars, np.uint8).reshape(n, num_bytes)
    if n < n_table:
        packed = np.pad(packed, ((0, n_table - n), (0, 0)))
    lengths = (
        np.zeros(len(output_bit_table), np.int32)
        if output_lengths is None
        else np.asarray(output_lengths, np.int32)
    )
    return _packed_query_jit(
        handle.t_split,
        jnp.asarray(packed),
        jnp.asarray(lengths),
        tuple(int(b) for b in output_bit_table),
        handle.window_width,
        curve,
        output_lengths is not None,
    )


def fixed_packed_multiexponentiation(
    handle: MultiexpHandle, output_bit_table, n: int, scalars
):
    """Reference sxt_fixed_packed_multiexponentiation (blitzar_api.h:712).
    If BLITZAR_TPU_DUMP_DIR is set, the computation (inputs, accessor, and
    result) is recorded for offline replay (reference gpu_backend.cc:286-301)."""
    curve = handle.curve
    output_bit_table = [int(b) for b in output_bit_table]
    result = _packed_query(handle, output_bit_table, n, scalars)
    _record_with_result(
        handle,
        f"packed-{curve.name}",
        result,
        output_bit_table=np.asarray(output_bit_table, np.uint32),
        n=np.asarray(n, np.uint64),
        scalars=np.asarray(scalars, np.uint8),
    )
    return result


def fixed_vlen_multiexponentiation(
    handle: MultiexpHandle, output_bit_table, output_lengths, scalars
):
    """Reference sxt_fixed_vlen_multiexponentiation (blitzar_api.h:741):
    output_lengths must be ascending; output o uses only the first
    output_lengths[o] generators — bits past the length are zeroed so their
    groups hit table entry 0 (identity)."""
    output_bit_table = [int(b) for b in output_bit_table]
    output_lengths = [int(v) for v in output_lengths]
    assert all(
        a <= b for a, b in zip(output_lengths, output_lengths[1:])
    ), "output_lengths must be sorted ascending"
    n = max(output_lengths) if output_lengths else 0
    result = _packed_query(
        handle, output_bit_table, n, scalars, output_lengths
    )
    _record_with_result(
        handle,
        f"vlen-{handle.curve.name}",
        result,
        output_bit_table=np.asarray(output_bit_table, np.uint32),
        output_lengths=np.asarray(output_lengths, np.uint32),
        scalars=np.asarray(scalars, np.uint8),
    )
    return result

"""Canonical ristretto generator derivation and precompute cache.

Generator for row index i is elligator(r1) + elligator(r0) where (r0, r1) are
two field elements drawn from xorshift128+ seeded (i+1, i+2) — the exact
derivation of reference seqcommit/generator/base_element.cc:30-45 and
sxt/field51/random/element.cc. The RNG runs vectorized on the host (numpy
uint64); the elligator map and point addition run batched on device.
"""

from __future__ import annotations

import functools
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from .curves import edwards25519 as ed
from .curves import ristretto as rst
from .fields import fp25519 as F

_CHUNK = 4096

# host-side (pure Python) derivation for small batches on CPU: the
# elligator+add XLA program costs ~2 min to compile on XLA:CPU, which
# dominates tiny test / dryrun processes. 0 disables.
_HOST_MAX = int(os.environ.get("BLITZAR_TPU_GENERATORS_HOST_MAX", "4096"))

# derived generators are canonical constants -> cache the limb arrays on
# disk so fresh processes skip the ~95 s device derivation sweep at 2^20
# (reference keeps an in-process precomputed_generators cache only;
# a disk prefix is the same idea across processes). "" disables.
_DISK_DIR = os.environ.get(
    "BLITZAR_TPU_GENERATOR_CACHE_DIR", "/tmp/blitzar_tpu_gencache"
)


def _host_generators(n: int, offset: int) -> ed.PointP3:
    """Pure-Python derivation (refimpl, bit-exact vs pinned vectors) ->
    PointP3 limbs; no XLA program, so no compile cost for tiny batches."""
    from .refimpl import core as refc

    pts = refc.get_generators(n, offset)
    coords = np.zeros((4, 16, n), dtype=np.uint32)
    for i, p in enumerate(pts):
        for k in range(4):
            v = p[k]
            for l in range(16):
                coords[k, l, i] = (v >> (16 * l)) & 0xFFFF
    return ed.PointP3(*(jnp.asarray(c) for c in coords))


def _disk_cache_path(n: int) -> str | None:
    if not _DISK_DIR:
        return None
    return os.path.join(_DISK_DIR, f"ristretto_gen_a_{n}.npy")


@jax.jit
def _affine_to_p3_chunk(x16, y16) -> ed.PointP3:
    """Affine (16, chunk) uint16 limb pairs -> extended PointP3 (z = 1,
    t = x*y). The mul routes through the fused Pallas kernel on TPU
    (inline-XLA muls at 2^20 width cost ~50 s of compile)."""
    from .msm import fixed as _fixed

    x = x16.astype(jnp.uint32)
    y = y16.astype(jnp.uint32)
    t = _fixed._fmul(x, y)
    one = F.from_int_const(1, x.shape[1:])
    return ed.PointP3(x, y, one, t)


def _affine_to_p3(x16, y16) -> ed.PointP3:
    """Chunked at a FIXED size so one compiled program serves every n."""
    n = x16.shape[-1]
    if n <= _DEVICE_CHUNK or n % _DEVICE_CHUNK:
        return _affine_to_p3_chunk(x16, y16)
    chunks = [
        _affine_to_p3_chunk(
            x16[:, s : s + _DEVICE_CHUNK], y16[:, s : s + _DEVICE_CHUNK]
        )
        for s in range(0, n, _DEVICE_CHUNK)
    ]
    return ed.PointP3(*(jnp.concatenate(cs, axis=1) for cs in zip(*chunks)))


def _disk_load(n: int) -> ed.PointP3 | None:
    """Load the smallest cached prefix >= n (sliced down if larger).

    The cache stores AFFINE x/y as uint16 limbs (the limbs are 16-bit
    values) — 4x less than the extended uint32 form, which matters because
    loading uploads the whole array across the (slow) host-device link.
    z = 1 / t = x*y are recomputed on device. Legacy extended-uint32 files
    (ristretto_gen_<n>.npy) are still honored."""
    if not _DISK_DIR or not os.path.isdir(_DISK_DIR):
        return None
    best = None
    for name in os.listdir(_DISK_DIR):
        if not name.endswith(".npy"):
            continue
        for prefix, affine in (("ristretto_gen_a_", True), ("ristretto_gen_", False)):
            if name.startswith(prefix):
                try:
                    count = int(name[len(prefix) : -4])
                except ValueError:
                    break
                if count >= n and (
                    best is None or count < best[0] or (count == best[0] and affine)
                ):
                    best = (count, affine, name)
                break
    if best is None:
        return None
    count, affine, name = best
    try:
        arr = np.load(os.path.join(_DISK_DIR, name))
    except Exception:
        return None
    if affine:
        if arr.shape != (2, 16, count) or arr.dtype != np.uint16:
            return None
        return _affine_to_p3(
            jnp.asarray(arr[0, :, :n]), jnp.asarray(arr[1, :, :n])
        )
    if arr.shape != (4, 16, count) or arr.dtype != np.uint32:
        return None
    return ed.PointP3(*(jnp.asarray(arr[k, :, :n]) for k in range(4)))


@jax.jit
def _to_affine_xy_chunk(x, y, z):
    """(16, chunk) extended coords -> affine (x, y) uint16 limb arrays
    (generators never include the identity, so z is invertible). Inversion
    and muls route through the fused Pallas kernels on TPU (msm.fixed
    helpers) — the inline-XLA chain would dominate compile time."""
    from .msm import fixed as _fixed

    zinv = _fixed._finvert(z)
    xa = _fixed._fmul(x, zinv)
    ya = _fixed._fmul(y, zinv)
    return xa.astype(jnp.uint16), ya.astype(jnp.uint16)


def _to_affine_xy(points: ed.PointP3):
    """Chunked at a FIXED size so the conversion program compiles once and
    serves every n (a shape-specialized jit would pay minutes of XLA
    compile per distinct cache size)."""
    n = points.x.shape[-1]
    if n <= _DEVICE_CHUNK or n % _DEVICE_CHUNK:
        return _to_affine_xy_chunk(points.x, points.y, points.z)
    xs, ys = [], []
    for start in range(0, n, _DEVICE_CHUNK):
        sl = slice(start, start + _DEVICE_CHUNK)
        xc, yc = _to_affine_xy_chunk(points.x[:, sl], points.y[:, sl], points.z[:, sl])
        xs.append(xc)
        ys.append(yc)
    return jnp.concatenate(xs, axis=-1), jnp.concatenate(ys, axis=-1)


def _disk_save(points: ed.PointP3, n: int) -> None:
    path = _disk_cache_path(n)
    if path is None or os.path.exists(path):
        return
    try:
        x16, y16 = _to_affine_xy(points)
        arr = np.stack([np.asarray(x16), np.asarray(y16)])
        os.makedirs(_DISK_DIR, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=_DISK_DIR, suffix=".npy")
        os.close(fd)
        np.save(tmp, arr)
        os.replace(tmp, path)
    except OSError:
        pass


def _xorshift_limbs(indices: np.ndarray):
    """Vectorized xorshift128+ -> two (16, n) uint32 limb arrays (bit255 masked)."""
    indices = np.asarray(indices, dtype=np.uint64)
    a = indices + np.uint64(1)
    b = indices + np.uint64(2)
    outs = []
    for _ in range(8):
        t = a
        s = b
        a = s
        t = t ^ (t << np.uint64(23))
        t = t ^ (t >> np.uint64(17))
        t = t ^ s ^ (s >> np.uint64(26))
        b = t
        outs.append(t + s)

    def to_limbs(words):  # 4 x (n,) uint64 -> (16, n) uint32
        rows = []
        for w in words:
            for j in range(4):
                rows.append(((w >> np.uint64(16 * j)) & np.uint64(0xFFFF)).astype(np.uint32))
        limbs = np.stack(rows)
        limbs[15] &= np.uint32(0x7FFF)
        return limbs

    return to_limbs(outs[0:4]), to_limbs(outs[4:8])


@functools.partial(jax.jit)
def _form_points(r0_limbs, r1_limbs) -> ed.PointP3:
    from .ops import pallas_point as pp

    if pp.use_pallas():
        # whole elligator pair + add fused in one kernel: the ~500-mul sqrt
        # chains stay in VMEM instead of round-tripping HBM per multiply
        return pp.elligator_form(r0_limbs, r1_limbs)
    return ed.add(rst.elligator(r1_limbs), rst.elligator(r0_limbs))


def _xorshift_limbs_device(lo, hi):
    """Device xorshift128+ on (hi, lo) uint32 pairs (TPU has no uint64):
    same draws as _xorshift_limbs, vectorized over the index batch."""

    def add64(a, b):
        lo_ = a[1] + b[1]
        carry = (lo_ < a[1]).astype(jnp.uint32)
        return (a[0] + b[0] + carry, lo_)

    def shl(a, k):
        return ((a[0] << k) | (a[1] >> (32 - k)), a[1] << k)

    def shr(a, k):
        return (a[0] >> k, (a[1] >> k) | (a[0] << (32 - k)))

    def xor(a, b):
        return (a[0] ^ b[0], a[1] ^ b[1])

    one = jnp.ones_like(lo)
    a = add64((hi, lo), (jnp.zeros_like(lo), one))
    b = add64((hi, lo), (jnp.zeros_like(lo), one + one))
    outs = []
    for _ in range(8):
        t, s = a, b
        a = s
        t = xor(t, shl(t, 23))
        t = xor(t, shr(t, 17))
        t = xor(t, xor(s, shr(s, 26)))
        b = t
        outs.append(add64(t, s))

    def to_limbs(words):  # 4 x (hi, lo) -> (16, n) uint32 16-bit limbs
        rows = []
        for w_hi, w_lo in words:
            rows += [w_lo & 0xFFFF, w_lo >> 16, w_hi & 0xFFFF, w_hi >> 16]
        limbs = jnp.stack(rows)
        return limbs.at[15].set(limbs[15] & 0x7FFF)

    return to_limbs(outs[0:4]), to_limbs(outs[4:8])


_DEVICE_CHUNK = 1 << 16


@functools.partial(jax.jit, static_argnames=("chunk",))
def _generators_device_chunk(start_lo, start_hi, chunk: int) -> ed.PointP3:
    """One chunk of all-device generator derivation: iota -> xorshift128+ ->
    elligator. Dispatched per chunk from the host (wrapping the whole sweep
    in one lax.map program was observed to hard-crash the TPU worker)."""
    i = jax.lax.broadcasted_iota(jnp.uint32, (chunk, 1), 0)[:, 0]
    lo = start_lo + i
    hi = start_hi + (lo < start_lo).astype(jnp.uint32)
    r0, r1 = _xorshift_limbs_device(lo, hi)
    return _form_points(r0, r1)


def _generators_device(offset: int, n: int) -> ed.PointP3:
    chunks = []
    for start in range(0, n, _DEVICE_CHUNK):
        idx = offset + start
        chunks.append(
            _generators_device_chunk(
                jnp.uint32(idx & 0xFFFFFFFF),
                jnp.uint32(idx >> 32),
                min(_DEVICE_CHUNK, n - start),
            )
        )
    if len(chunks) == 1:
        return chunks[0]
    return ed.PointP3(*(jnp.concatenate(cs, axis=1) for cs in zip(*chunks)))


def ristretto_generators(n: int, offset: int = 0) -> ed.PointP3:
    """PointP3 batch of the canonical generators [offset, offset + n)."""
    if n == 0:
        return ed.identity((0,))
    if offset == 0:
        cached = _disk_load(n)
        if cached is not None:
            return cached
    from .utils.backend import compute_platform

    if n <= _HOST_MAX and compute_platform() == "cpu":
        return _host_generators(n, offset)
    if n >= _DEVICE_CHUNK and n % _DEVICE_CHUNK == 0:
        pts = _generators_device(offset, n)
        if offset == 0 and n >= _DEVICE_CHUNK:
            jax.block_until_ready(pts.x)
            _disk_save(pts, n)
        return pts
    chunks = []
    for start in range(0, n, _CHUNK):
        count = min(_CHUNK, n - start)
        idx = np.arange(offset + start, offset + start + count, dtype=np.uint64)
        if count < _CHUNK:
            idx = np.concatenate([idx, np.zeros(_CHUNK - count, np.uint64)])
        r0, r1 = _xorshift_limbs(idx)
        pts = _form_points(jnp.asarray(r0), jnp.asarray(r1))
        chunks.append(ed.index_batch(pts, (slice(0, count),)))
    if len(chunks) == 1:
        return chunks[0]
    return ed.PointP3(*(jnp.concatenate(cs, axis=1) for cs in zip(*chunks)))


class _GeneratorCache:
    """Process-global prefix of precomputed generators (mirrors reference
    seqcommit/generator/precomputed_generators.cc)."""

    def __init__(self):
        self.points: ed.PointP3 | None = None
        self.count = 0
        # memoized slices: identical (offset, n) requests return the SAME
        # array object, so identity-keyed caches downstream (the MSM handle
        # cache, msm/engine.py) hit across calls
        self._slices: dict[tuple[int, int], ed.PointP3] = {}

    def get(self, n: int, offset: int = 0) -> ed.PointP3:
        end = offset + n
        if end > self.count:
            grow_to = max(end, 2 * self.count)
            self.points = ristretto_generators(grow_to)
            self.count = grow_to
            self._slices.clear()
        key = (offset, end)
        sl = self._slices.get(key)
        if sl is None:
            sl = ed.index_batch(self.points, (slice(offset, end),))
            if len(self._slices) > 16:
                self._slices.clear()
            self._slices[key] = sl
        return sl

    def reset(self):
        self.points = None
        self.count = 0
        self._slices.clear()


CACHE = _GeneratorCache()


def init_precomputed_generators(n: int):
    if n > 0:
        CACHE.get(n)


def get_precomputed_generators(n: int, offset: int = 0) -> ed.PointP3:
    return CACHE.get(n, offset)


def one_commitment(n: int) -> ed.PointP3:
    """Sum of the first n generators (reference cpu_one_commitments semantics:
    the 'one commit' of length n)."""
    if n == 0:
        return ed.identity(())
    gens = get_precomputed_generators(n)
    return ed.tree_reduce(gens, n)


def one_commitments(n: int) -> ed.PointP3:
    """Prefix sums: out[i] = sum_{j<i} G_j, out[0] = identity; batch (n,)."""
    if n == 0:
        return ed.identity((0,))
    gens = get_precomputed_generators(n)
    inclusive = jax.lax.associative_scan(ed.add, gens, axis=1)
    shifted = ed.PointP3(
        *(
            jnp.concatenate([c[:, :1] * 0, c[:, :-1]], axis=1)
            for c in inclusive
        )
    )
    ident = ed.identity((n,))
    # slot 0 must be the identity (0,1,1,0), not zeroed limbs
    return ed.PointP3(
        *(
            jnp.concatenate([ic[:, :1], sc[:, 1:]], axis=1)
            for ic, sc in zip(ident, shifted)
        )
    )

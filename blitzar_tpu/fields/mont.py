"""Generic Montgomery-form prime-field arithmetic, vectorized for TPU lanes.

One parameterized implementation covers every Montgomery field in the library
(the reference carries four hand-written copies: field25, field12, fieldgk,
scalar25 — see reference sxt/field25/base/montgomery.h etc.):

  - curve25519 scalar field (l = 2^252 + ...)
  - bn254 base field Fp          (reference field25)
  - bn254 scalar field Fr = Grumpkin base field (reference fieldgk)
  - bls12-381 base field Fp      (reference field12)

Representation: (nlimbs, *batch) uint32 arrays of 16-bit limbs, canonical in
[0, m), Montgomery form (R = 2^(16*nlimbs)). TPUs have no 64-bit multiply, so
the full product uses the same skewed outer-product schoolbook as fp25519 and
the reduction is word-serial Montgomery with 16-bit digits (radix-2^16 CIOS
reorganized for vector lanes; every op is full-batch-width).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Python-int constants are inlined as immediates (Pallas kernel bodies
# reject captured device arrays; weak typing keeps uint32 semantics)
MASK = 0xFFFF

_DIAG = [False]


@functools.partial(jax.jit, static_argnames=("field",))
def _from_mont_jit(field, a):
    return field.from_mont(a)


@contextlib.contextmanager
def diag_mode():
    """Trace-time switch to the Pallas-friendly diagonal limb product."""
    _DIAG.append(True)
    try:
        yield
    finally:
        _DIAG.pop()


class MontField:
    def __init__(self, name: str, modulus: int, nlimbs: int):
        assert modulus % 2 == 1
        assert modulus < 1 << (16 * nlimbs)
        self.name = name
        self.modulus = modulus
        self.nlimbs = nlimbs
        self.radix_bits = 16 * nlimbs
        self.r = (1 << self.radix_bits) % modulus
        self.r2 = self.r * self.r % modulus
        self.r3 = self.r2 * self.r % modulus
        self.n0p = (-pow(modulus, -1, 1 << 16)) % (1 << 16)
        self.mod_limbs = self._int_limbs(modulus)
        self.nbytes = 2 * nlimbs

    # -- host helpers --------------------------------------------------------

    def _int_limbs(self, v: int) -> np.ndarray:
        return np.array(
            [(v >> (16 * i)) & 0xFFFF for i in range(self.nlimbs)], dtype=np.uint32
        )

    def from_ints(self, values) -> jnp.ndarray:
        """Python ints -> Montgomery-form (nlimbs, n) device array."""
        out = np.stack(
            [self._int_limbs(int(v) % self.modulus * self.r % self.modulus) for v in values],
            axis=1,
        )
        return jnp.asarray(out)

    def to_ints(self, arr) -> list[int]:
        """Montgomery-form (nlimbs, n) -> python ints (standard form).
        The device conversion runs under jit: the eager variant dispatched
        every mont-reduce primitive separately — ~30 round trips through the
        device tunnel for a 4-element coefficient array."""
        std = np.asarray(_from_mont_jit(self, arr))
        return [
            sum(int(std[i, j]) << (16 * i) for i in range(self.nlimbs))
            for j in range(std.shape[1])
        ]

    # -- constants ----------------------------------------------------------

    def _const(self, v: int, batch_ndim: int) -> jnp.ndarray:
        return jnp.asarray(self._int_limbs(v)).reshape(
            (self.nlimbs,) + (1,) * batch_ndim
        )

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.nlimbs,) + tuple(batch_shape), dtype=jnp.uint32)

    def one(self, batch_shape=()):
        if _DIAG[-1]:
            # Pallas kernel bodies reject captured device arrays; inline the
            # Montgomery-one limbs as scalar immediates (fp25519 pattern)
            limbs = [(self.r >> (16 * i)) & 0xFFFF for i in range(self.nlimbs)]
            return jnp.stack(
                [jnp.full(tuple(batch_shape), l, jnp.uint32) for l in limbs]
            )
        c = self._const(self.r, len(batch_shape))
        return jnp.broadcast_to(c, (self.nlimbs,) + tuple(batch_shape))

    # -- carry / compare helpers ---------------------------------------------

    @staticmethod
    def _scan_unroll() -> bool:
        """Rolled lax.scan carry/borrow chains on CPU (small HLO; XLA:CPU
        compile time binds the dryrun/test suite), unrolled on TPU (identical
        graphs to the hand-unrolled form). Bit-identical values either way."""
        from ..utils.backend import compute_platform

        return compute_platform() == "tpu"

    def _carry_rows(self, rows):
        """Carry propagation; diag (Pallas) mode keeps the unrolled python
        list form, otherwise a rolled scan over the stacked limb axis.
        Accepts a list of rows or a stacked array; returns (list-indexable
        rows, carry)."""
        if _DIAG[-1]:
            out = []
            c = None
            for i in range(len(rows)):
                t = rows[i] if c is None else rows[i] + c
                out.append(t & MASK)
                c = t >> 16
            return out, c
        stacked = jnp.stack(rows) if isinstance(rows, list) else rows

        def step(c, row):
            t = row + c
            return t >> 16, t & MASK

        c, out = lax.scan(
            step, jnp.zeros_like(stacked[0]), stacked,
            unroll=self._scan_unroll(),
        )
        return out, c

    def _sub_borrow(self, rows, sub_limbs):
        """sub_limbs: python-int limbs."""
        if _DIAG[-1]:
            out = []
            borrow = None
            for i in range(self.nlimbs):
                t = rows[i] + (0x10000 - int(sub_limbs[i]))
                if borrow is not None:
                    t = t - borrow
                out.append(t & MASK)
                borrow = 1 - (t >> 16)
            return out, borrow
        stacked = jnp.stack(rows) if isinstance(rows, list) else rows
        c = jnp.asarray(
            [0x10000 - int(sub_limbs[i]) for i in range(self.nlimbs)],
            jnp.uint32,
        ).reshape((self.nlimbs,) + (1,) * (stacked.ndim - 1))
        return self._sub_borrow_scan_const(stacked, c)

    def _sub_borrow_scan_const(self, stacked, comp):
        """Borrow chain with a precomputed (0x10000 - b) complement array."""
        def step(borrow, rows):
            t = rows[0] + rows[1] - borrow
            return 1 - (t >> 16), t & MASK

        borrow, out = lax.scan(
            step,
            jnp.zeros_like(stacked[0]),
            (stacked, jnp.broadcast_to(comp, stacked.shape)),
            unroll=self._scan_unroll(),
        )
        return out, borrow

    def _cond_sub_m(self, rows, overflow):
        """rows (nlimbs, canonical-limb), overflow in {0,1}: value may be in
        [0, 2m); subtract m when overflow or rows >= m."""
        d, borrow = self._sub_borrow(rows, [int(v) for v in self.mod_limbs])
        take_d = (overflow == 1) | (borrow == 0)
        if _DIAG[-1]:
            return [jnp.where(take_d, dv, rv) for dv, rv in zip(d, rows)]
        stacked = jnp.stack(rows) if isinstance(rows, list) else rows
        return jnp.where(take_d[None], d, stacked)

    # -- ring ops -------------------------------------------------------------

    def add(self, a, b):
        if _DIAG[-1]:
            rows, c = self._carry_rows(
                [a[i] + b[i] for i in range(self.nlimbs)]
            )
            return jnp.stack(self._cond_sub_m(rows, c))
        rows, c = self._carry_rows(a + b)
        return self._cond_sub_m(rows, c)

    def _sub_borrow_arr(self, rows, sub_rows):
        """Borrow-chain subtraction where the subtrahend is per-lane data."""
        if _DIAG[-1]:
            out = []
            borrow = None
            for i in range(self.nlimbs):
                t = rows[i] + 0x10000 - sub_rows[i]
                if borrow is not None:
                    t = t - borrow
                out.append(t & MASK)
                borrow = 1 - (t >> 16)
            return out, borrow
        a_st = jnp.stack(rows) if isinstance(rows, list) else rows
        b_st = jnp.stack(sub_rows) if isinstance(sub_rows, list) else sub_rows

        def step(borrow, r):
            t = r[0] + 0x10000 - r[1] - borrow
            return 1 - (t >> 16), t & MASK

        borrow, out = lax.scan(
            step, jnp.zeros_like(a_st[0]), (a_st, b_st),
            unroll=self._scan_unroll(),
        )
        return out, borrow

    def sub(self, a, b):
        if _DIAG[-1]:
            d, borrow = self._sub_borrow_arr(
                [a[i] for i in range(self.nlimbs)],
                [b[i] for i in range(self.nlimbs)],
            )
            mod_ints = [int(v) for v in self.mod_limbs]
            add_back = [dv + mv * borrow for dv, mv in zip(d, mod_ints)]
            rows, _ = self._carry_rows(add_back)  # carry-out drops
            return jnp.stack(rows)
        d, borrow = self._sub_borrow_arr(a, b)
        mod_arr = jnp.asarray(self.mod_limbs).reshape(
            (self.nlimbs,) + (1,) * (a.ndim - 1)
        )
        rows, _ = self._carry_rows(d + mod_arr * borrow)
        return rows

    def neg(self, a):
        return self.sub(self.zeros(a.shape[1:]), a)

    def _schoolbook_skew(self, a, b):
        """(2n, *batch) accumulator rows via one outer product + Toeplitz
        skew — few HLO ops, so XLA graphs with many multiplies (Weierstrass
        MSM trees, inversion chains) compile quickly."""
        n = self.nlimbs
        outer = a[:, None] * b[None, :]
        lo = outer & MASK
        hi = outer >> 16
        batch = outer.shape[2:]

        def skew(mat):
            padded = jnp.concatenate(
                [mat, jnp.zeros((n, n + 1) + batch, jnp.uint32)], axis=1
            )
            flat = padded.reshape((n * (2 * n + 1),) + batch)
            return flat[: n * 2 * n].reshape((n, 2 * n) + batch)

        acc = jnp.sum(skew(lo), axis=0, dtype=jnp.uint32)
        acc_hi = jnp.sum(skew(hi), axis=0, dtype=jnp.uint32)
        acc = acc + jnp.concatenate(
            [jnp.zeros((1,) + batch, jnp.uint32), acc_hi[:-1]]
        )
        return [acc[i] for i in range(2 * n)]

    def _schoolbook(self, a, b):
        """2*nlimbs accumulator rows (python list) of the full product, each
        < 2^22. Diagonal accumulation (used under diag_mode, e.g. in future
        Pallas kernel bodies): every intermediate is (*batch,)-shaped and
        elementwise — no outer-product materialization, but ~n^2 HLO ops,
        which only Mosaic compiles quickly."""
        if not _DIAG[-1]:
            return self._schoolbook_skew(a, b)
        n = self.nlimbs
        a_rows = [a[i] for i in range(n)]
        b_rows = [b[j] for j in range(n)]
        acc = [None] * (2 * n)
        for i in range(n):
            ai = a_rows[i]
            for j in range(n):
                p = ai * b_rows[j]  # exact in uint32
                k = i + j
                lo = p & MASK
                hi = p >> 16
                acc[k] = lo if acc[k] is None else acc[k] + lo
                acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
        return acc  # list of 2n rows

    def _mont_reduce(self, acc_rows):
        """2n accumulator rows (list, each < 2^22, or a (2n, *batch) array)
        -> T*R^-1 mod m, canonical. Valid for any T < R^2 with
        T/R + m < 2^(radix+1). Word-serial CIOS over python-list rows so the
        whole reduction stays one fused elementwise chain."""
        n = self.nlimbs
        if not _DIAG[-1]:
            return self._mont_reduce_array(acc_rows)
        if not isinstance(acc_rows, list):
            acc_rows = [acc_rows[i] for i in range(acc_rows.shape[0])]
        zero = acc_rows[0] - acc_rows[0]
        acc = list(acc_rows) + [zero]
        mod_rows = [int(v) for v in self.mod_limbs]
        n0p = self.n0p
        for i in range(n):
            u = ((acc[i] & MASK) * n0p) & MASK
            for j in range(n):
                prod = u * mod_rows[j]  # exact 32-bit
                acc[i + j] = acc[i + j] + (prod & MASK)
                acc[i + j + 1] = acc[i + j + 1] + (prod >> 16)
            acc[i + 1] = acc[i + 1] + (acc[i] >> 16)
        rows, c = self._carry_rows(acc[n : 2 * n])
        # remaining top row (acc[2n]) + carry: 0 or 1 (result < 2m)
        top = acc[2 * n] + c
        return jnp.stack(self._cond_sub_m(rows, top))

    def _mont_reduce_array(self, acc_rows):
        """Array-form word-serial Montgomery reduction (few HLO ops per step
        via sliced .at-updates) — the XLA-graph default."""
        n = self.nlimbs
        if isinstance(acc_rows, list):
            acc_rows = jnp.stack(acc_rows)
        batch = acc_rows.shape[1:]
        acc = jnp.concatenate([acc_rows, jnp.zeros((1,) + batch, jnp.uint32)])
        mod_arr = jnp.asarray(self.mod_limbs).reshape((n,) + (1,) * len(batch))
        n0p = jnp.uint32(self.n0p)
        if self._scan_unroll():
            for i in range(n):
                u = ((acc[i] & MASK) * n0p) & MASK
                prod = u[None] * mod_arr  # (n, *batch) exact 32-bit
                acc = acc.at[i : i + n].add(prod & MASK)
                acc = acc.at[i + 1 : i + n + 1].add(prod >> 16)
                acc = acc.at[i + 1].add(acc[i] >> 16)
        else:
            # rolled CIOS: same updates via fixed-size dynamic slices (the
            # window [i, i+n+1) has static length), scanned over the word
            # index — one loop body in the graph instead of n unrolled steps
            def step(acc, i):
                win = lax.dynamic_slice_in_dim(acc, i, n + 1, axis=0)
                u = ((win[0] & MASK) * n0p) & MASK
                prod = u[None] * mod_arr  # (n, *batch) exact 32-bit
                win = win.at[:n].add(prod & MASK)
                win = win.at[1 : n + 1].add(prod >> 16)
                win = win.at[1].add(win[0] >> 16)
                return lax.dynamic_update_slice_in_dim(acc, win, i, axis=0), None

            acc, _ = lax.scan(step, acc, jnp.arange(n))
        rows, c = self._carry_rows([acc[n + i] for i in range(n)])
        top = acc[2 * n] + c  # 0 or 1 (result < 2m)
        return self._cond_sub_m(rows, top)

    def mul(self, a, b):
        """Montgomery product: a*b*R^-1 mod m (canonical inputs/outputs)."""
        return self._mont_reduce(self._schoolbook(a, b))

    def mul_const(self, a, value: int):
        """Multiply by a fixed field constant (semantic int): the constant's
        Montgomery limbs are inlined as scalar immediates (Pallas-safe)."""
        if not _DIAG[-1]:
            m = value % self.modulus * self.r % self.modulus
            return self.mul(a, jnp.broadcast_to(
                self._const(m, a.ndim - 1), a.shape))
        n = self.nlimbs
        m = value % self.modulus * self.r % self.modulus
        c_limbs = [(m >> (16 * i)) & 0xFFFF for i in range(n)]
        a_rows = [a[i] for i in range(n)]
        acc = [None] * (2 * n)
        for i in range(n):
            ci = c_limbs[i]
            if ci == 0:
                continue
            for j in range(n):
                p = a_rows[j] * ci
                k = i + j
                lo = p & MASK
                hi = p >> 16
                acc[k] = lo if acc[k] is None else acc[k] + lo
                acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
        zero = a_rows[0] - a_rows[0]
        acc = [zero if r is None else r for r in acc]
        return self._mont_reduce(acc)

    def sq(self, a):
        return self.mul(a, a)

    # -- exponentiation -------------------------------------------------------

    def pow_const(self, a, exponent: int):
        """a^exponent (Montgomery in/out) via scan over the fixed bit string."""
        bits = [int(bit) for bit in bin(exponent)[2:]]
        bits_arr = jnp.asarray(np.array(bits, np.uint32))
        one = self.one(a.shape[1:])

        def step(acc, bit):
            acc = self.sq(acc)
            acc = jnp.where(bit.astype(jnp.bool_), self.mul(acc, a), acc)
            return acc, None

        acc, _ = lax.scan(step, one, bits_arr)
        return acc

    def inv(self, a):
        """a^(m-2); 0 -> 0."""
        return self.pow_const(a, self.modulus - 2)

    def sqrt_3mod4(self, a):
        """Square root for m == 3 (mod 4): a^((m+1)/4). Caller checks validity."""
        assert self.modulus % 4 == 3
        return self.pow_const(a, (self.modulus + 1) // 4)

    # -- predicates / conversion ----------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def gt_const_std(self, a, value: int):
        """Standard-form comparison from_mont(a) > value, batched bool
        (used for the 'lexicographically largest y' compression flag,
        reference field12 lexicographically_largest property)."""
        std = self.from_mont(a)
        rows = [std[i] for i in range(self.nlimbs)]
        _, borrow = self._sub_borrow(rows, self._int_limbs(value + 1))
        return borrow == 0

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def cmov(self, a, b, cond):
        return jnp.where(cond[None].astype(jnp.bool_), b, a)

    def to_mont(self, a_std):
        r2 = jnp.broadcast_to(
            self._const(self.r2, a_std.ndim - 1),
            a_std.shape,
        )
        return self.mul(a_std, r2)

    def from_mont(self, a):
        one_std = jnp.broadcast_to(self._const(1, a.ndim - 1), a.shape)
        return self.mul(a, one_std)

    def from_bytes_le(self, b):
        """(nbytes_in, *batch) uint8 LE -> Montgomery form; any value up to
        2^radix is fully reduced (Montgomery-reduce first, then scale by R^3:
        std*R^-1 * R^3 * R^-1 = std*R)."""
        b = b.astype(jnp.uint32)
        nb = b.shape[0]
        batch = b.shape[1:]
        if nb < self.nbytes:
            b = jnp.concatenate([b, jnp.zeros((self.nbytes - nb,) + batch, jnp.uint32)])
        pairs = b[: self.nbytes].reshape((self.nlimbs, 2) + batch)
        std = pairs[:, 0] | (pairs[:, 1] << 8)
        reduced = self._mont_reduce(
            jnp.concatenate([std, jnp.zeros_like(std)])
        )  # = std * R^-1 mod m, canonical
        r3 = jnp.broadcast_to(self._const(self.r3, len(batch)), std.shape)
        return self.mul(reduced, r3)

    def to_bytes_le(self, a):
        """Montgomery form -> (nbytes, *batch) uint8 canonical little-endian."""
        std = self.from_mont(a)
        lo = (std & jnp.uint32(0xFF)).astype(jnp.uint8)
        hi = ((std >> 8) & jnp.uint32(0xFF)).astype(jnp.uint8)
        return jnp.stack([lo, hi], axis=1).reshape((self.nbytes,) + a.shape[1:])

    # -- reductions ------------------------------------------------------------

    def tree_sum(self, a, axis_size: int):
        """Sum along the LAST batch axis by halving (zero-padded)."""
        cur = a
        size = axis_size
        while size > 1:
            if size % 2 == 1:
                cur = jnp.concatenate(
                    [cur, self.zeros(cur.shape[1:-1] + (1,))], axis=-1
                )
                size += 1
            cur = self.add(cur[..., 0:size:2], cur[..., 1:size:2])
            size //= 2
        return cur[..., 0]

    def inner_product(self, a, b, n: int):
        """<a, b> over the last batch axis (Montgomery in/out)."""
        return self.tree_sum(self.mul(a, b), n)

"""Pinned cross-implementation digests for self-validating benchmark rows.

Every TPU benchmark row asserts its device result against a digest pinned
here before emitting a timing (VERDICT r4 weak #2: a wrong carry in the
bf16 table path must not ship a fast wrong number). Provenance:

- ristretto rows: the digests were produced by the REFERENCE's CPU backend
  (tools/ref_cpu_bench in canonical mode — the reference's own
  seqcommit/generator base elements + the counter scalar pattern below)
  AND independently by this repo's CPU platform; both agree byte-for-byte.
- Weierstrass rows: this repo's CPU platform (f32 tables, inline-XLA
  kernels — a fully independent code path from the TPU bf16/Pallas path);
  small-n bit-exactness vs the pure-Python oracle is pinned in tests/.

Regenerate with tools/make_pinned_digests.py (CPU platform, slow).
"""

from __future__ import annotations

import numpy as np

K1 = 0x9E3779B97F4A7C15
K2 = 0xC2B2AE3D27D4EB4F


def counter_scalars(n: int, nbytes: int = 32, output: int = 0) -> np.ndarray:
    """Deterministic language-neutral scalar rows: row i =
    LE64((i+output)*K1) || LE64((i+output)*K2 + 1) || zeros — must match
    tools/ref_cpu_bench/main.cc exactly."""
    i = np.arange(n, dtype=np.uint64) + np.uint64(output)
    with np.errstate(over="ignore"):
        v1 = i * np.uint64(K1)
        v2 = i * np.uint64(K2) + np.uint64(1)
    rows = np.zeros((n, nbytes), np.uint8)
    rows[:, : min(8, nbytes)] = (
        v1.astype("<u8").view(np.uint8).reshape(n, 8)[:, : min(8, nbytes)]
    )
    if nbytes >= 16:
        rows[:, 8:16] = v2.astype("<u8").view(np.uint8).reshape(n, 8)
    return rows


def wcurve_bench_points(curve, n: int):
    """The deterministic generator set the Weierstrass bench rows use: 512
    seeded oracle points tiled to n (building 2^20 independent points costs
    minutes host-side; tiling keeps the table build honest while the digest
    stays reproducible)."""
    import jax.numpy as jnp

    base = curve.from_affine_ints(curve.oracle.random_points(min(n, 512), seed=7))
    reps = -(-n // base.x.shape[-1])
    return curve.make_point(*(jnp.tile(c, (1, reps))[:, :n] for c in base))


# op -> {(key...): hex digest}
# ristretto_msm: key (log_n,) — canonical generators, counter scalars (32B),
#   value = compressed ristretto result (independently produced by the
#   reference CPU backend; see module docstring)
# wcurve_msm: key (curve_name, log_n) — wcurve_bench_points + counter
#   scalars, value = blake2b-128 of the affine int pair
PINNED: dict[str, dict] = {
    "ristretto_msm": {},
    "wcurve_msm": {},
}

try:  # generated file (tools/make_pinned_digests.py)
    from .pinned_digests import PINNED as _P  # type: ignore

    PINNED.update(_P)
except ImportError:
    try:
        from pinned_digests import PINNED as _P  # script-style import

        PINNED.update(_P)
    except ImportError:
        pass


def ristretto_digest(out_point) -> str:
    """Single output: the compressed point hex (comparable to the reference
    binary's res0_compressed). Multi-output: blake2b-128 over all encodings."""
    from blitzar_tpu.curves import ristretto as rst

    raw = np.asarray(rst.encode(out_point))  # (32, O)
    if raw.shape[1] == 1:
        return bytes(raw[:, 0]).hex()
    import hashlib

    return "b2:" + hashlib.blake2b(raw.T.tobytes(), digest_size=16).hexdigest()


def wcurve_digest(curve, out_point) -> str:
    import hashlib

    pts = curve.to_affine_ints(out_point)
    h = hashlib.blake2b(digest_size=16)
    for p in pts:
        if p is None:
            h.update(b"inf")
        else:
            h.update(int(p[0]).to_bytes(64, "little"))
            h.update(int(p[1]).to_bytes(64, "little"))
    return h.hexdigest()

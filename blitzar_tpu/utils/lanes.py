"""Gather-free lane shifts for dynamic-width round kernels.

XLA:TPU lowers general gathers (take_along_axis with computed indices) to
a scalar-unit loop — measured ~15-20 s for one (16, 3, 2^20) gather on
v5e, which dominated the dynamic-mid IPA/sumcheck rounds. Every "gather"
those rounds need is actually a SHIFT by a traced amount (or a periodic
tiling of a shifted prefix), all expressible with pad + lax.dynamic_slice
(pure data movement, ~ms at these sizes).

Conventions: arrays are (..., W) with W static; shift amounts are traced
int32 scalars in [0, W].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def shift_down(x, k):
    """out[..., j] = x[..., j + k] for j + k < W, else 0 (left shift)."""
    w = x.shape[-1]
    padded = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
    starts = (0,) * (x.ndim - 1) + (k,)
    return lax.dynamic_slice(padded, starts, x.shape)


def shift_up(x, k):
    """out[..., j] = x[..., j - k] for j >= k, else 0 (right shift)."""
    w = x.shape[-1]
    padded = jnp.concatenate([jnp.zeros_like(x), x], axis=-1)
    starts = (0,) * (x.ndim - 1) + (w - k,)
    return lax.dynamic_slice(padded, starts, x.shape)


def tile_periodic(x, period):
    """Periodically tile the first `period` lanes across the whole width.

    x: (..., W) with x[..., j] = 0 for j >= period (the pattern lives in
    the first `period` lanes); period: traced int32, a power of two that
    divides W. Returns out[..., j] = x[..., j mod period].

    Built by masked doubling: each step ORs in a copy shifted by the
    current filled length, so log2(W) dynamic slices replace a general
    gather."""
    w = x.shape[-1]
    out = x
    # clamp to W after every doubling: a shift by W is a no-op (all zeros),
    # and an UNclamped filled overflows int32 within 20 doublings at large
    # periods — the negative shift then slices the array onto itself and
    # silently doubles values (only reproducible at W >~ 2^12)
    filled = jnp.minimum(jnp.asarray(period, jnp.int32), w)
    steps = max(w.bit_length() - 1, 0)  # log2(W) for power-of-two W
    for _ in range(steps):
        shifted = shift_up(out, filled)
        out = out + shifted  # disjoint supports: plain add is an OR
        filled = jnp.minimum(filled * 2, jnp.int32(w))
    return out

"""utils.lanes: gather-free shifts and periodic tiling vs numpy."""

import numpy as np

import jax.numpy as jnp

from blitzar_tpu.utils import lanes


def test_shifts_match_numpy():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**32, size=(4, 64), dtype=np.uint32)
    for k in (0, 1, 7, 63, 64):
        down = np.asarray(lanes.shift_down(jnp.asarray(x), k))
        up = np.asarray(lanes.shift_up(jnp.asarray(x), k))
        want_down = np.zeros_like(x)
        want_down[:, : 64 - k] = x[:, k:]
        want_up = np.zeros_like(x)
        want_up[:, k:] = x[:, : 64 - k]
        assert (down == want_down).all(), k
        assert (up == want_up).all(), k


def test_tile_periodic_small():
    x = np.zeros((2, 16), np.uint32)
    x[:, :4] = [[1, 2, 3, 4], [5, 6, 7, 8]]
    got = np.asarray(lanes.tile_periodic(jnp.asarray(x), 4))
    assert (got == np.tile(x[:, :4], (1, 4))).all()


def test_tile_periodic_large_width_no_overflow():
    """Regression: the doubling fill length overflowed int32 once
    period * 2^steps passed 2^31 (W >= ~2^16 with a large period), slicing
    the array onto itself and doubling values."""
    w = 1 << 17
    period = 1 << 16
    x = np.zeros((1, w), np.uint32)
    pattern = np.arange(1, period + 1, dtype=np.uint32)
    x[0, :period] = pattern
    got = np.asarray(lanes.tile_periodic(jnp.asarray(x), period))
    assert (got[0] == np.tile(pattern, w // period)).all()
    # and the degenerate full-width period is the identity
    full = np.arange(w, dtype=np.uint32)[None]
    got2 = np.asarray(lanes.tile_periodic(jnp.asarray(full), w))
    assert (got2 == full).all()

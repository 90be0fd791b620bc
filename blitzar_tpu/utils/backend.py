"""Where will dispatch actually land?

`jax.default_backend()` reports the highest-priority PLATFORM, but
`api.init(backend="cpu")` on an accelerator host routes dispatch to the
host CPU via `jax_default_device` — the platform stays "tpu" while every
computation runs on CPU. Code gating TPU-only behavior (Pallas kernels,
bf16 table dtype, scan-rolled carries) must look at the default DEVICE
first, or it dispatches TPU kernels onto the CPU backend ("Only interpret
mode is supported on CPU backend").
"""

from __future__ import annotations

import jax


def compute_platform() -> str:
    """Platform of the device computations actually dispatch to."""
    device = jax.config.jax_default_device
    if device is not None:
        return device.platform
    return jax.default_backend()

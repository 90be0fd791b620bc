# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.
#
# NOTE: this environment preloads jax and registers a TPU backend in
# sitecustomize, so plain env vars are too late — force the platform through
# jax.config before any backend is instantiated.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BLITZAR_TPU_TEST_PLATFORM=tpu runs the suite on the real chip instead of
# the virtual 8-device CPU mesh (used to produce the committed TPU-platform
# conformance log; mesh-dependent tests skip themselves on 1 device)
_TEST_PLATFORM = os.environ.get("BLITZAR_TPU_TEST_PLATFORM", "cpu")

_flags = os.environ.get("XLA_FLAGS", "")
if _TEST_PLATFORM == "cpu" and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if _TEST_PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
# any other value: leave platform selection alone (the tunnel TPU registers
# as the "axon" plugin platform and is the default where present)

# Cap XLA:CPU codegen at AVX2 BEFORE the backend exists: uncapped AOT cache
# entries embed prefer-no-gather/scatter pseudo-features their own loader
# rejects, spraying load errors on every run (utils/cache.cpu_isa_cap_flag).
from blitzar_tpu.utils.cache import apply_cpu_flags as _apply_cpu_flags  # noqa: E402

_apply_cpu_flags()

import jax  # noqa: E402

if _TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are large and
# XLA compiles are slow; cache them across test runs. The directory is
# machine-keyed (utils/cache.py) — XLA:CPU AOT results from a different host
# fail to load and stall the process — and tagged: these entries are built
# with the AVX2 cap, distinct from the untagged (TPU-platform) dir.
from blitzar_tpu.utils.cache import configure as _configure_cache  # noqa: E402

_configure_cache(
    jax.config, tag="avx2" if _TEST_PLATFORM == "cpu" else "bench"
)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Keep the long-running suite's RSS bounded: drop live compiled programs
    after each test module (the persistent compilation cache makes reloads
    cheap). Without this the process grows past 15 GB and XLA:CPU has been
    observed to segfault mid-compile."""
    yield
    jax.clear_caches()

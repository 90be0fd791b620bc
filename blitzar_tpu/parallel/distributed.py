"""Multi-host distribution scaffolding.

The reference is a single-process, single-node library (SURVEY.md §2.7: no
NCCL/MPI; inter-GPU exchange rides host pinned memory). On TPU the JAX
runtime IS the communication backend: `jax.distributed.initialize` joins the
hosts, device meshes span slices, and the MSM/sumcheck collectives
(`all_gather`/`psum` in msm/sharded.py, proof/sumcheck_sharded.py) ride ICI
within a slice and DCN across slices automatically.

Mesh policy (the scaling-book recipe): put the axis whose collective is
cheapest across DCN on the OUTER mesh dimension. For MSM that is the output
axis (zero communication — output shards never talk, msm/sharded.py
msm_partition_sharded2d_jit); the point-axis fold (O(outputs x bits) bytes,
independent of n) stays within a slice on ICI. This is what makes >=80%
scaling 1 -> N hosts achievable: per-host work is O(n/D) while the only
cross-host traffic is a fixed-size partial-product fold.

Environment (all optional — single-process runs need none of this):
  BLITZAR_TPU_COORDINATOR   coordinator address host:port
  BLITZAR_TPU_NUM_PROCESSES total process count
  BLITZAR_TPU_PROCESS_ID    this process's index
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = [False]


def is_initialized() -> bool:
    return _INITIALIZED[0]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join a multi-host JAX runtime. No-op when single-process (no
    coordinator configured). Mirrors sxt_init's one-shot semantics
    (reference cbindings/backend.cc:112-127): calling twice panics."""
    if _INITIALIZED[0]:
        raise RuntimeError("blitzar_tpu.parallel.initialize called twice")
    coordinator_address = coordinator_address or os.environ.get(
        "BLITZAR_TPU_COORDINATOR"
    )
    if coordinator_address is None:
        _INITIALIZED[0] = True
        return
    num_processes = num_processes or int(
        os.environ["BLITZAR_TPU_NUM_PROCESSES"]
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ["BLITZAR_TPU_PROCESS_ID"])
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED[0] = True


def global_mesh():
    """1-D point-axis mesh over every device in the job (all hosts)."""
    from ..msm import sharded

    return sharded.make_mesh(jax.devices())


def global_mesh_mle():
    """1-D MLE-axis mesh over every device in the job — the sumcheck
    prover's layout (proof/sumcheck_sharded.py: cyclic MLE sharding, folds
    communication-free, one O(degree) all_gather per round)."""
    from ..proof import sumcheck_sharded

    return sumcheck_sharded.make_mesh(jax.devices())


def global_mesh2d(outputs: int | None = None):
    """2-D (outputs x points) mesh over every device in the job. With
    multiple hosts the outputs axis spans processes (DCN) — its shards never
    communicate — and the points axis stays within a host/slice (ICI).
    Defaults outputs to the process count (1 single-host)."""
    from ..msm import sharded

    devices = jax.devices()
    explicit = outputs is not None
    if outputs is None:
        outputs = max(jax.process_count(), 1)
    if len(devices) % outputs:
        if explicit:
            raise ValueError(
                f"outputs={outputs} does not divide device count {len(devices)}"
            )
        outputs = 1
    per = len(devices) // outputs
    # order devices so each outputs-row is one process's devices (keeps the
    # points axis on ICI)
    rows = sorted(devices, key=lambda d: (d.process_index, d.id))
    return sharded.make_mesh2d(outputs, per, np.asarray(rows))

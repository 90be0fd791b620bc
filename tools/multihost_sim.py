#!/usr/bin/env python
"""Multi-host CPU simulation: 2 jax.distributed processes x 4 CPU devices.

Exercises the REAL multi-host code path end-to-end without TPU pods
(VERDICT r3 #3): each process joins a jax.distributed cluster over gloo
collectives, parallel.initialize() is called exactly as a production
multi-host deployment would, the 2-D (outputs x points) global mesh spans
both processes with the outputs axis across processes (DCN in production,
see blitzar_tpu/parallel/distributed.py), and the sharded MSM + sharded
sumcheck run one problem each whose results are checked bit-exactly against
the pure-Python oracle on every process.

The reference has no multi-host story (SURVEY §2.7) — this is the evidence
for the new capability's code path. Run directly, from tools/ci.sh, or via
pytest (tests/test_multihost.py).

Usage: python tools/multihost_sim.py            # parent: spawn + check
       (child mode is internal: --child <pid> --port <port>)
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4


def child(process_id: int, port: int) -> None:
    sys.path.insert(0, REPO)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
        ).strip()

    # Cap XLA:CPU codegen at AVX2 so AOT cache entries don't embed the
    # prefer-no-gather/scatter pseudo-features their own loader rejects
    # (utils/cache.cpu_isa_cap_flag) — with the cap, the persistent cache is
    # safe for the distributed children too.
    from blitzar_tpu.utils.cache import apply_cpu_flags as _apply_cpu_flags
    from blitzar_tpu.utils.cache import configure as _configure_cache

    _apply_cpu_flags()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    _configure_cache(jax.config, tag="multihost_avx2")

    from blitzar_tpu import parallel

    # the production entry: joins the cluster through the same wrapper a
    # real deployment uses (env-config flavor is covered by passing args)
    parallel.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    assert len(jax.devices()) == NUM_PROCESSES * DEVICES_PER_PROCESS

    import numpy as np

    from blitzar_tpu.curves import ristretto as rst
    from blitzar_tpu import generators as gen
    from blitzar_tpu.parallel import distributed
    from blitzar_tpu.refimpl import core as ref

    # -- 2-D sharded MSM on the global mesh (outputs across processes) ------
    mesh2 = distributed.global_mesh2d(NUM_PROCESSES)
    assert mesh2.shape == {
        "outputs": NUM_PROCESSES,
        "points": DEVICES_PER_PROCESS,
    }, mesh2.shape

    from blitzar_tpu.msm import sharded

    n, num_outputs, nbytes = 64, 2, 4
    points = gen.ristretto_generators(n)
    rng = np.random.default_rng(11)
    scalars = rng.integers(
        0, 256, size=(num_outputs, n, nbytes), dtype=np.uint8
    )
    out = sharded.msm_partition2d(mesh2, points, scalars, n)
    # the result is sharded over the outputs axis ACROSS processes — gather
    # the global value (production callers keep it sharded; the oracle check
    # needs all of it on every host)
    from jax.experimental import multihost_utils

    got = np.asarray(multihost_utils.process_allgather(rst.encode(out), tiled=True))

    expected = []
    for o in range(num_outputs):
        rows = [
            int.from_bytes(bytes(scalars[o, i]), "little") for i in range(n)
        ]
        expected.append(
            np.frombuffer(
                ref.ristretto_encode(ref.pedersen_commitment(rows, nbytes, False)),
                np.uint8,
            )
        )
    want = np.stack(expected, axis=1)
    assert (got == want).all(), "multi-host 2-D sharded MSM != oracle"

    # -- sharded sumcheck over the full 8-device (1-D) global mesh ----------
    from blitzar_tpu.proof import sumcheck as sc
    from blitzar_tpu.proof import sumcheck_sharded as scs
    from blitzar_tpu.proof.transcript import Transcript

    codec = sc.SCALAR25519_CODEC
    m = codec.field.modulus
    n_sc = 37  # non-power-of-2, pads to 64 over 8 global devices
    mles = [
        [int(v) for v in rng.integers(0, 2**61, size=n_sc)] for _ in range(2)
    ]
    product_table = [(1, 2)]
    product_terms = [0, 1]
    mesh1 = distributed.global_mesh_mle()
    polys_s, eval_s = scs.prove_sum_sharded(
        mesh1,
        sc.ReferenceSumcheckTranscript(Transcript(b"multihost"), codec),
        mles, product_table, product_terms, n_sc, codec,
    )
    polys, eval_ = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"multihost"), codec),
        mles, product_table, product_terms, n_sc, codec,
    )
    assert polys_s == polys and eval_s == eval_, "sharded sumcheck mismatch"

    print(f"MULTIHOST_CHILD_{process_id}_OK", flush=True)


def parent() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", str(i), "--port", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(NUM_PROCESSES)
    ]
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        if f"MULTIHOST_CHILD_{i}_OK" not in out or p.returncode != 0:
            ok = False
            print(f"--- child {i} rc={p.returncode} ---")
            print(out[-4000:])
    if ok:
        print("MULTIHOST_OK")
        return 0
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(
            int(sys.argv[sys.argv.index("--child") + 1]),
            int(sys.argv[sys.argv.index("--port") + 1]),
        )
    else:
        sys.exit(parent())

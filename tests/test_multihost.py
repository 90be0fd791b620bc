"""Multi-host (2-process jax.distributed, gloo) end-to-end check.

Runs tools/multihost_sim.py as a subprocess pair: the production
parallel.initialize entry, a 2-D (outputs x points) global mesh whose
outputs axis spans processes, sharded MSM + sharded sumcheck vs the oracle
(VERDICT r3 #3 — the >=80% multi-host scaling row's code path).

~3 minutes on a 1-core host (XLA:CPU compiles x 2 processes), so it only
runs when BLITZAR_TPU_RUN_SLOW=1 (tools/ci.sh always runs the sim directly).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("BLITZAR_TPU_RUN_SLOW", "") in ("", "0"),
    reason="multi-process sim is minutes of XLA:CPU compile; ci.sh runs it",
)
def test_multihost_sim():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_sim.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0 and "MULTIHOST_OK" in r.stdout, r.stdout[-4000:]

"""End-to-end test of the native C ABI (cbindings/): builds libblitzar_tpu.so
and drives it in a SUBPROCESS (tests/capi_driver.py) — the shim's panic()
aborts the process on misuse (mirroring the reference's panic semantics,
reference base/error/panic.h), which must not take pytest down. Checks the
same cross-surface equalities as the reference's cbindings tests
(reference cbindings/pedersen.t.cc, inner_product_proof.t.cc)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_capi_end_to_end(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    subprocess.run(
        [os.path.join(REPO, "cbindings", "build.sh"), str(tmp_path)],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tests", "capi_driver.py"),
            str(tmp_path / "libblitzar_tpu.so"),
            REPO,
        ],
        capture_output=True, text=True, env=env, timeout=1700,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "CAPI_OK" in proc.stdout

    # ABI drop-in proof: a pure-C consumer of blitzar_tpu_api.h (the port of
    # the reference sys-crate's end-to-end test with its hardcoded
    # commitments, reference rust/tests/src/main.rs:26-48) compiles against
    # the header and runs against the .so. gcc -x c enforces C (not C++)
    # linkage semantics, the same declarations bindgen would parse.
    abi_bin = str(tmp_path / "abi_test")
    subprocess.run(
        [
            "gcc" if shutil.which("gcc") else "g++",
            "-x", "c", "-std=c11",
            os.path.join(REPO, "cbindings", "abi_test.c"),
            "-I", os.path.join(REPO, "cbindings"),
            "-L", str(tmp_path), "-lblitzar_tpu",
            "-Wl,-rpath," + str(tmp_path),
            "-o", abi_bin,
        ],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [abi_bin], capture_output=True, text=True, env=env, timeout=1700,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "ABI_OK" in proc.stdout

"""Scalar-multiply a batch of curve25519 points on two backends and check
they agree — counterpart of reference example/exponentiation1 (CPU vs GPU
exponentiation of the same inputs; here the two backends are the host CPU
platform and whatever JAX's default device is, bit-identical by construction)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.refimpl import core as R

N = 8
points = gen.ristretto_generators(N)

# device: 2^k * P via repeated doubling, whole batch at once
doubled = points
for _ in range(5):
    doubled = ed.double(doubled)
device_bytes = np.asarray(rst.encode(doubled)).T  # (N, 32)

# host oracle: 32 * P with pure-Python ints
oracle = [R.pt_scalar_mul(32, R.compute_base_element(i)) for i in range(N)]
oracle_bytes = [R.ristretto_encode(p) for p in oracle]

for i in range(N):
    assert bytes(device_bytes[i]) == oracle_bytes[i], f"mismatch at {i}"
    print(f"32 * G[{i}] = {oracle_bytes[i].hex()}")
print("device == host oracle for all points")

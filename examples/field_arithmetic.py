"""Batched field arithmetic + reduction on device — counterpart of reference
example/field_arithmetic/reduce.cc (sum a vector of field elements on the
accelerator and check against the host).

Uses the bn254 scalar field (fieldgk in the reference); the same MontField
API serves bls12-381 Fp, bn254 Fp, and the Grumpkin base field."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from blitzar_tpu.fields import params

F = params.BN254_FR
N = 1024

rng = np.random.default_rng(42)
values = [int(rng.integers(0, 1 << 62)) ** 4 % F.modulus for _ in range(N)]

a = F.from_ints(values)            # (nlimbs, N) Montgomery-form limb array
squares = F.mul(a, a)              # batched modular multiply
total = F.tree_sum(squares, N)     # log-depth reduction on device

(device_sum,) = F.to_ints(total.reshape(F.nlimbs, 1))
host_sum = sum(v * v for v in values) % F.modulus
assert device_sum == host_sum
print(f"sum of {N} squares mod r = {hex(device_sum)}")

"""Multiproduct: many subset sums over one generator set — counterpart of
reference example/multiproduct1/main.cc. Each output is the sum of a subset
of the generators; the packed fixed-MSM entry point computes all subsets in
one device program (each output is a 1-bit-scalar MSM)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import fixed
from blitzar_tpu.refimpl import core as R

N = 16
SUBSETS = [
    0b1,                # {G0}
    0b11,               # {G0, G1}
    0b1010101010101010, # every other generator
    0b1111111111111111, # all 16
]

handle = fixed.MultiexpHandle(gen.ristretto_generators(N), window_width=4)

# one packed bit-column per point: bit o of row i = "point i in subset o"
num_outputs = len(SUBSETS)
packed = np.zeros((N, 1), dtype=np.uint8)
for o, mask in enumerate(SUBSETS):
    for i in range(N):
        if mask >> i & 1:
            packed[i, 0] |= 1 << o
result = fixed.fixed_packed_multiexponentiation(
    handle, [1] * num_outputs, N, packed
)
result_bytes = np.asarray(rst.encode(result)).T  # (num_outputs, 32)

pts = R.get_generators(N)
for o, mask in enumerate(SUBSETS):
    acc = (0, 1, 1, 0)  # identity
    for i in range(N):
        if mask >> i & 1:
            acc = R.pt_add(acc, pts[i])
    expected = R.ristretto_encode(acc)
    assert bytes(result_bytes[o]) == expected, f"subset {o} mismatch"
    print(f"subset {mask:#018b}: {expected.hex()}")
print("all subset sums match the host oracle")

"""Minimal Pedersen commitment — counterpart of the reference's C API hello
world (reference example/cbindings1/main.cc:22-47): commit to the sequence
[1, 2, 3] of 1-byte scalars over the canonical ristretto generators and print
the 32-byte compressed commitment."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from blitzar_tpu import api

api.init(backend="auto")

data = np.array([[1], [2], [3]], dtype=np.uint8)  # n=3 rows of 1 byte
descriptor = api.SequenceDescriptor(element_nbytes=1, n=3, data=data, is_signed=False)
commitments = api.compute_curve25519_commitments([descriptor])
print(bytes(commitments[0]).hex())

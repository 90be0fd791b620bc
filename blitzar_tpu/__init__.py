"""blitzar_tpu — a TPU-native zero-knowledge-proof primitive library.

A from-scratch JAX/Pallas re-design of the capabilities of
spaceandtimefdn/blitzar: multi-scalar multiplication / generalized Pedersen
commitments over curve25519/ristretto255, bls12-381 G1, bn254 G1 and Grumpkin;
a Bulletproofs-style inner-product-argument prover/verifier; and a sumcheck
prover — vectorized over TPU lanes and sharded over device meshes.
"""

__version__ = "0.1.0"

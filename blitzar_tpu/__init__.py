"""blitzar_tpu — a TPU-native zero-knowledge-proof primitive library.

A from-scratch JAX/Pallas re-design of the capabilities of
spaceandtimefdn/blitzar: multi-scalar multiplication / generalized Pedersen
commitments over curve25519/ristretto255, bls12-381 G1, bn254 G1 and Grumpkin;
a Bulletproofs-style inner-product-argument prover/verifier; and a sumcheck
prover — vectorized over TPU lanes and sharded over device meshes.
"""

__version__ = "0.1.0"

__all__ = [
    "api",
    "generators",
    "SXT_CURVE_RISTRETTO255",
    "SXT_CURVE_BLS_381",
    "SXT_CURVE_BN_254",
    "SXT_CURVE_GRUMPKIN",
    "SXT_FIELD_SCALAR255",
    "SXT_FIELD_GRUMPKIN",
]


def __getattr__(name):
    # lazy: importing the package must stay cheap (no jax import) for tools
    # that only want metadata
    if name in ("api", "generators"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    if name.startswith("SXT_"):
        from . import api as _api

        return getattr(_api, name)
    raise AttributeError(name)

"""Generated from tools/make_pinned_digests.py output (CPU platform, this host) —
see benchmarks/pinned.py for provenance. ristretto_msm entries were produced by THE
REFERENCE CPU BACKEND binary (tools/ref_cpu_bench canonical mode) and verified
equal to this repo's own result.
"""

PINNED = {'pedersen': {(10000, 1, 1): '5830eb0ba7a4b4946df493438ad313bedebca61bbd09524be384aad8f843c214', (10000, 1, 32): '7e84a9e1a82a5cbb4654a1219352fa4946885714281cb373b86f185da3319b70', (10000, 10, 1): 'b2:fb16a04a5679c5cd5732cf308306b1d6', (10000, 10, 32): 'b2:aa18da86959a61e94e51e2e3a8c7ad02', (100000, 1, 1): 'bea09b0e0517c06ab85701fdd13ddf280cca965be8c0c664b559df4d83759d48', (100000, 1, 32): '660612d9a10f01c6721a8b35dcd6fb240358aa38957e1d5857b5fdc6e249ad28', (100000, 10, 1): 'b2:2b1a54d6fb349da3f17844b1c8593546', (100000, 10, 32): 'b2:7d8c3fa03557ce6b28cf72d7bbc354bb', (1000000, 1, 1): 'cac397ea883e0eb8340bafffe8443d2e9b84ce68502540bdeb51b7f42e92d637', (1000000, 1, 32): '6c88b5a77a8a61e975e194908c222679e24d718721f0c83c05d5d5ec7975d15c', (1000000, 10, 1): 'b2:6302587bbb1cf5f64c841ecc93e25387'}, 'ristretto_msm': {(16,): '52b35ab759789e0c1d408b587fde2312f5b4eaea78f563b92a886bc232f3e516', (20,): 'f89560f09c6bc178be50fdeae2968eb9b46578cdc32ca4f806d8219c4ecf0a56'}}

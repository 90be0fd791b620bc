"""Frozen external test vectors.

- RUST_*: end-to-end Pedersen commitment vectors from the reference repo's
  rust sys-crate tests (reference rust/tests/src/main.rs:26-48).
- RISTRETTO_BASEPOINT_MULTIPLES: RFC 9496 §A.1 small multiples of the
  ristretto255 generator (public standard vectors).
"""

RUST_DATA = [
    [2000, 7500, 5000, 1500],
    [5000, 0, 400000, 10],
    [2000 + 5000, 7500 + 0, 5000 + 400000, 1500 + 10],
]
RUST_NBYTES = 4
RUST_EXPECTED = [
    bytes([4, 105, 58, 131, 59, 69, 150, 106, 120, 137, 32, 225, 175, 244, 82, 115,
           216, 180, 206, 150, 21, 250, 240, 98, 251, 192, 146, 244, 54, 169, 199, 97]),
    bytes([2, 254, 178, 195, 198, 238, 44, 156, 24, 29, 88, 196, 37, 63, 157, 50,
           236, 159, 61, 49, 153, 181, 79, 126, 55, 188, 67, 1, 228, 248, 72, 51]),
    bytes([30, 237, 163, 234, 252, 111, 45, 133, 235, 227, 21, 117, 229, 188, 88, 149,
           240, 109, 205, 90, 6, 130, 199, 152, 5, 221, 57, 231, 168, 9, 141, 122]),
]

RISTRETTO_BASEPOINT_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
]

ED25519_BASEPOINT_X = 15112221349535400772501151409588531511454012693041857206046113283949847762202

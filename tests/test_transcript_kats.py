"""Protocol-transcript known-answer tests.

Two anchors the self-pinned IVC digest cannot provide on its own:

1. MimcRO squeeze of a small fixed transcript, checked against an
   INDEPENDENT straight-line int implementation written here from the
   reference algorithm (nova/src/hash.rs:50-103: chained-Blake2b round
   constants with person=b"mimc", x^7 Feistel, acc += s + mimc(s, acc),
   low-128-bit squeeze), plus a pinned hex value as a regression anchor.

2. The first Miller-loop line coefficients of G2Prepared(G2 generator)
   (bn254/src/g2.rs:213-310 semantics, Algorithms 26/27). The coefficient
   Miller loop is already cross-validated against the transparent pairing
   (tests/test_pairing_fast.py); the pinned values freeze the precompute
   byte-for-byte so a silent formula change cannot pass unnoticed.
"""

import hashlib

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import Fq, Fr, G2_SPEC
from kogarashi_tpu.pyref.mimc import MimcRO
from kogarashi_tpu.pyref.pairing_fast import G2Prepared

PINNED_SQUEEZE_123 = 0xA3D1C88F9E39A313393FD0F2A483317F

# G2Prepared(G2 generator).coeffs[0] — three Fq2 line coefficients as
# (c0, c1) int pairs (first doubling step of the 6u+2 NAF loop)
PINNED_G2PREP_COEFF0 = (
    (
        0x1ABD2C248D001783725D804BB5ABA9E1F7C63312C89D835FF77AA3EEC36CF961,
        0x241A2741617FC1D7B27A66B5A430CE56F12CC4CDC2CE3BCD56B36B73448A5D6C,
    ),
    (
        0x01F415EE716B4F2DB393FCAF7ED7F50DB0AD362719EDE6827328E4160E6CB794,
        0x1804C4B7C94DFED879FBB4D68E818AE8999B1DAB4687A75FCD940C6A97159693,
    ),
    (
        0x0111BCE5D9DAD117EADDA82FCAA6BBB1739A63AB122F2DBA3F7CC5F02CBC13D2,
        0x20130DDCD60D616F4E31A13E07E336DFE91CC0F08F59161E83C6448F118D08E3,
    ),
)


def _independent_mimc_constants(p: int) -> list[int]:
    h = hashlib.blake2b(digest_size=64, person=b"mimc")
    out = []
    for _ in range(C.MIMC_ROUNDS):
        digest = h.digest()
        h.update(digest)
        out.append(int.from_bytes(h.digest(), "little") % p)
    return out


def _independent_mimc_hash(xl: int, xr: int, consts: list[int], p: int) -> int:
    for c in consts:
        cxl = (xl + c) % p
        xl, xr = (pow(cxl, 7, p) + xr) % p, xl
    return xl


def test_mimc_squeeze_vs_independent_derivation():
    p = Fq.p
    consts = _independent_mimc_constants(p)
    acc = 0
    for s in (1, 2, 3):
        acc = (acc + s + _independent_mimc_hash(s, acc, consts, p)) % p
    independent = acc & ((1 << C.CHALLENGE_BITS) - 1)

    ro = MimcRO(Fq, Fr)
    for s in (1, 2, 3):
        ro.append(Fq(s))
    got = ro.squeeze(C.CHALLENGE_BITS)
    assert got.v == independent
    assert got.v == PINNED_SQUEEZE_123


def test_mimc_point_absorb_matches_independent():
    """append_point absorbs (x, y, 1) for a non-identity point."""
    p = Fq.p
    from kogarashi_tpu.pyref import G1_SPEC

    pt = G1_SPEC.generator
    consts = _independent_mimc_constants(p)
    acc = 0
    for s in (pt.x.v, pt.y.v, 1):
        acc = (acc + s + _independent_mimc_hash(s, acc, consts, p)) % p
    independent = acc & ((1 << C.CHALLENGE_BITS) - 1)

    ro = MimcRO(Fq, Fr)
    ro.append_point(pt)
    assert ro.squeeze(C.CHALLENGE_BITS).v == independent


def test_g2_prepared_generator_coefficients_pinned():
    prep = G2Prepared.from_affine(G2_SPEC.generator)
    assert len(prep.coeffs) == 91  # 64 doublings + 25 NAF adds + 2 Frobenius
    got = tuple(
        (comp.c0.v, comp.c1.v) for comp in prep.coeffs[0]
    )
    assert got == PINNED_G2PREP_COEFF0

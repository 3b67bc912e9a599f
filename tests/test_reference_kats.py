"""Bit-exactness anchors against the Rust reference's committed constants.

These are the known-answer tests the round-1 verdict asked to commit: they
pin the pairing stack to the reference's precomputed values, so any future
regression in the tower/Miller loop/final exponentiation diverges loudly.

Sources:
  - Fq12::generator() = e(G1, G2): /root/reference/bn254/src/fqn.rs:150-243
    (Montgomery-form 4xu64 limbs, R = 2^256 mod q)
  - final_exp(1) == identity, unitarity, 5-pair multi-Miller:
    /root/reference/bn254/tests/pairing.rs:38-93 (OsRng there; fixed seed here)
"""

import random

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import Fq, Fq2, Fq6, Fq12
from kogarashi_tpu.pyref.curve import G1_SPEC, G2_SPEC
from kogarashi_tpu.pyref.gt import Gt
from kogarashi_tpu.pyref.pairing_fast import (
    G2Prepared,
    final_exp_fast,
    multi_miller_loop,
    pairing_fast,
)

# fqn.rs:150-243 — Fq12::generator() Montgomery limbs, listed as
# (c0.c0.c0, c0.c0.c1, c0.c1.c0, c0.c1.c1, c0.c2.c0, c0.c2.c1,
#  c1.c0.c0, c1.c0.c1, c1.c1.c0, c1.c1.c1, c1.c2.c0, c1.c2.c1)
_GT_GEN_MONT_LIMBS = [
    (0xC556F62B2A98671D, 0x23A59AC167BCF363, 0x5EF208445F5F6F37, 0x12ADF27CCB29382A),
    (0x2E02A64ACBD60549, 0xD618018EA58E4ADD, 0x14D585F1A45BA647, 0x1832226987C434FC),
    (0x2306E4312363B991, 0x465F6072D4023BF4, 0xA2FF062A4A77E736, 0x076EA6F18435864A),
    (0x172D1F257A4D598E, 0xDDF5BC7B7FFB5AC0, 0xAE0B22C0BBB0F602, 0x1B158F3C2FAE9B18),
    (0x5CF9CC917DA86724, 0xC799DC487A0B2753, 0x0DF2027BF1DE17A7, 0x197CDA6CC3E20636),
    (0xF16C96D081754CDB, 0xCE0394312BCEEB55, 0x644E4DCF1F01FF0A, 0x0CBEA85EE0B236CC),
    (0x1BB0CE0DEF1B82A1, 0x4C4C9FE1CADEFA95, 0x746D9990CB12B27E, 0x13495C08E5D415C5),
    (0x9458ABCB56D24998, 0xB17540BD2A9E5ADB, 0x9A9983C82E401A9F, 0x1614817A84C16291),
    (0x8975B68A2BAB1F9C, 0x2FDD826B796E0F35, 0x6A90A35FA03DFAA5, 0x1FFEF4581607FC37),
    (0x7002907C28EBFE11, 0x7B0591D3D080DA67, 0xDE7E5AA2181F138E, 0x210E437DFC43D951),
    (0x988AE2485B36CF53, 0x5091CC0581334E54, 0xDA7903229312CA0F, 0x2A2341538EAEE95C),
    (0xD34BAB373157AA84, 0x3511ED44FD0D8598, 0x67E42A0BC2CED972, 0x2B8F1D5DFD20C55B),
]


def _from_mont(limbs4) -> Fq:
    v = sum(l << (64 * i) for i, l in enumerate(limbs4))
    return Fq(v * pow(1 << 256, -1, C.Q) % C.Q)


def _gt_gen_reference() -> Fq12:
    f = [_from_mont(l) for l in _GT_GEN_MONT_LIMBS]
    return Fq12(
        Fq6(Fq2(f[0], f[1]), Fq2(f[2], f[3]), Fq2(f[4], f[5])),
        Fq6(Fq2(f[6], f[7]), Fq2(f[8], f[9]), Fq2(f[10], f[11])),
    )


def test_gt_generator_matches_reference_limbs():
    """e(G1, G2) equals the reference's precomputed Fq12::generator()."""
    got = pairing_fast(G1_SPEC.generator, G2_SPEC.generator)
    assert got == _gt_gen_reference()


def test_gt_generator_via_gt_wrapper():
    assert Gt.generator().f == _gt_gen_reference()


def test_final_exp_of_one_is_identity():
    """pairing.rs:38-41."""
    assert final_exp_fast(Fq12.one()) == Fq12.one()


def test_unitarity():
    """pairing.rs:82-93: -e(g,h) == e(g,-h) == e(-g,h)."""
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    p = -Gt(pairing_fast(g1, g2))
    q = Gt(pairing_fast(g1, -g2))
    r = Gt(pairing_fast(-g1, g2))
    assert p == q == r


def test_multi_miller_five_pairs_fixed_seed():
    """pairing.rs:43-80 with a fixed seed instead of OsRng."""
    rng = random.Random(0x4B41545F4D4D4C)
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    pairs = [(g1, g2)]
    for _ in range(4):
        pairs.append((rng.randrange(1, C.R) * g1, rng.randrange(1, C.R) * g2))
    expected = Gt.identity()
    for a, b in pairs:
        expected = expected + Gt(pairing_fast(a, b))
    test = multi_miller_loop([(a, G2Prepared.from_affine(b)) for a, b in pairs])
    assert Gt(final_exp_fast(test)) == expected


def test_bilinearity_fixed_seed():
    """pairing.rs:15-36 with a fixed seed."""
    rng = random.Random(0xB111)
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    a = rng.randrange(1, C.R)
    b = rng.randrange(1, C.R)
    c = a * b % C.R
    p = pairing_fast(a * g1, b * g2)
    assert p == pairing_fast(c * g1, g2)
    assert p == pairing_fast(g1, c * g2)

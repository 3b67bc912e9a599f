"""Subgroup/torsion checks + malicious-encoding rejection (VERDICT items 4/5).

Negative tests build genuinely hostile inputs: on-curve G2 points outside the
r-order subgroup (via the twist cofactor), off-curve points, and
non-canonical field bytes.
"""

import random

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.errors import DecodeError, MalformedProof
from kogarashi_tpu.pyref import Fq, Fq2
from kogarashi_tpu.pyref.curve import AffinePoint, G1_SPEC, G2_SPEC, GRUMPKIN_SPEC
from kogarashi_tpu.pyref.subgroup import (
    BETA,
    LAMBDA,
    g1_endomorphism,
    g1_is_torsion_free,
    g2_is_torsion_free,
    g2_psi,
    validate_point,
)
from kogarashi_tpu.utils import serde

# #E'(Fq2) = H2 * r for the BN254 D-twist
H2 = 36 * C.BN_X**4 + 36 * C.BN_X**3 + 30 * C.BN_X**2 + 6 * C.BN_X + 1


def _fq2_sqrt(a: Fq2):
    """sqrt in Fq[u]/(u^2+1) via the norm trick; None if not a QR."""
    if a.is_zero():
        return Fq2.new(0, 0)
    norm = a.c0 * a.c0 + a.c1 * a.c1
    s = norm.sqrt()
    if s is None:
        return None
    two_inv = Fq(pow(2, -1, C.Q))
    for sign in (s, -s):
        d = (a.c0 + sign) * two_inv
        x0 = d.sqrt()
        if x0 is None:
            continue
        if x0.v == 0:
            continue
        x1 = a.c1 * two_inv * x0.invert()
        cand = Fq2(x0, x1)
        if cand * cand == a:
            return cand
    return None


def _random_twist_point(rng):
    """A random on-curve point of E'(Fq2) — almost surely NOT in the
    r-subgroup."""
    b = G2_SPEC.b
    while True:
        x = Fq2.new(rng.randrange(C.Q), rng.randrange(C.Q))
        y = _fq2_sqrt(x * x * x + b)
        if y is not None:
            return AffinePoint(G2_SPEC, x, y, False)


def test_twist_cofactor_identity(rng):
    """Sanity: H2 * r annihilates random twist points (group order check)."""
    p = _random_twist_point(rng)
    assert ((H2 * C.R) * p).is_infinity


def test_g2_torsion_detects_non_subgroup(rng):
    p = _random_twist_point(rng)
    assert p.is_on_curve()
    assert not g2_is_torsion_free(p)
    # clearing the cofactor brings it into the subgroup
    cleared = H2 * p
    assert g2_is_torsion_free(cleared)


def test_g2_torsion_accepts_subgroup(rng):
    g2 = G2_SPEC.generator
    for _ in range(3):
        assert g2_is_torsion_free(rng.randrange(C.R) * g2)
    assert g2_is_torsion_free(0 * g2)


def test_g1_glv_eigenvalue(rng):
    g1 = G1_SPEC.generator
    p = rng.randrange(1, C.R) * g1
    assert g1_endomorphism(p) == LAMBDA * p
    assert g1_is_torsion_free(p)
    assert BETA.v != 1 and pow(BETA.v, 3, C.Q) == 1


def test_g2_psi_is_endomorphism(rng):
    g2 = G2_SPEC.generator
    a, b = rng.randrange(1, C.R), rng.randrange(1, C.R)
    assert g2_psi(a * g2) + g2_psi(b * g2) == g2_psi((a + b) % C.R * g2)


def test_validate_point_rejects_off_curve():
    bad = AffinePoint(G1_SPEC, Fq(123), Fq(456), False)
    assert not validate_point(bad)
    bad2 = AffinePoint(GRUMPKIN_SPEC, GRUMPKIN_SPEC.field(7), GRUMPKIN_SPEC.field(9), False)
    assert not validate_point(bad2)


# ---------------------------------------------------------------------------
# serde rejection
# ---------------------------------------------------------------------------


def test_decode_rejects_noncanonical_field_bytes():
    c = serde.Codec()
    c.raw = bytearray((C.Q + 1).to_bytes(32, "little")) if hasattr(c, "raw") else None
    data = (C.Q + 1).to_bytes(32, "little")
    with pytest.raises(DecodeError):
        serde.Decoder(data).field(C.Q)


def test_decode_rejects_off_curve_point():
    c = serde.Codec()
    c.field(123, C.Q).field(456, C.Q).boolean(False)
    with pytest.raises(MalformedProof):
        serde.Decoder(c.bytes()).point(G1_SPEC)


def test_decode_rejects_non_subgroup_g2_in_groth16_proof(rng):
    """Malicious proof: replace B with an on-curve, out-of-subgroup point."""
    from kogarashi_tpu.groth16.keys import Proof

    bad_b = _random_twist_point(rng)
    proof = Proof(a=G1_SPEC.generator, b=bad_b, c=G1_SPEC.generator)
    data = serde.encode_groth16_proof(proof)
    with pytest.raises(MalformedProof):
        serde.decode_groth16_proof(data)


def test_decode_accepts_valid_points(rng):
    c = serde.Codec()
    pt = rng.randrange(1, C.R) * G1_SPEC.generator
    c.point(pt)
    got = serde.Decoder(c.bytes()).point(G1_SPEC)
    assert got == pt

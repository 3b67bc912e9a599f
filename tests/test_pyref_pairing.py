"""Pairing oracle tests (mirrors bn254/tests/pairing.rs: bilinearity,
untwist correctness, final_exp(1)=1, unitarity)."""

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import (
    Fq12,
    G1_SPEC,
    G2_SPEC,
    final_exp,
    miller_loop,
    pairing,
    untwist,
)


def test_untwist_lands_on_curve():
    x, y = untwist(G2_SPEC.generator)
    from kogarashi_tpu.pyref.pairing import fq_to_fq12
    from kogarashi_tpu.pyref import Fq

    b = fq_to_fq12(Fq(3))
    assert y.square() == x.square() * x + b


def test_final_exp_of_one():
    assert final_exp(Fq12.one()) == Fq12.one()


@pytest.mark.slow
def test_bilinearity(rng):
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    a, b = rng.randrange(1, 2**64), rng.randrange(1, 2**64)
    e = pairing(g1, g2)
    assert e != Fq12.one()
    # e(aP, bQ) == e(P, Q)^(ab)
    lhs = pairing(a * g1, b * g2)
    assert lhs == e ** (a * b % C.R)
    # e(P, Q)^r == 1
    assert e**C.R == Fq12.one()


@pytest.mark.slow
def test_pairing_nondegeneracy_and_identity():
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    assert pairing(g1, G2_SPEC.identity_affine()) == Fq12.one()
    assert pairing(G1_SPEC.identity_affine(), g2) == Fq12.one()


@pytest.mark.slow
def test_unitarity(rng):
    """e(P,Q) * e(-P,Q) == 1 and conjugate == inverse in Gt."""
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    e1 = pairing(g1, g2)
    e2 = pairing(-g1, g2)
    assert e1 * e2 == Fq12.one()
    assert e1.conjugate() == e2

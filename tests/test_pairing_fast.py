"""Coefficient-based pairing vs the transparent oracle (mirrors
bn254/tests/pairing.rs: bilinearity, multi-Miller sums-vs-products,
final_exp(1)=1, unitarity)."""

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import Fq12, G1_SPEC, G2_SPEC, pairing
from kogarashi_tpu.pyref.pairing_fast import (
    G2Prepared,
    final_exp_fast,
    multi_miller_loop,
    pairing_fast,
)


def test_matches_transparent_pairing():
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    assert pairing_fast(g1, g2) == pairing(g1, g2)


def test_final_exp_one():
    assert final_exp_fast(Fq12.one()) == Fq12.one()


@pytest.mark.slow
def test_bilinearity_and_multi_pair(rng):
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    e = pairing_fast(g1, g2)
    a, b = rng.randrange(1, 2**64), rng.randrange(1, 2**64)
    assert pairing_fast(a * g1, b * g2) == e ** (a * b % C.R)

    # sum of pairings == product: e(aP,Q)e(bP,Q) = e((a+b)P,Q)
    q = G2Prepared.from_affine(g2)
    mm = multi_miller_loop([(a * g1, q), (b * g1, q)])
    assert final_exp_fast(mm) == pairing_fast((a + b) * g1, g2)


def test_identity_pairs_skipped():
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    q = G2Prepared.from_affine(g2)
    mm = multi_miller_loop(
        [(G1_SPEC.identity_affine(), q), (g1, G2Prepared.from_affine(G2_SPEC.identity_affine()))]
    )
    assert final_exp_fast(mm) == Fq12.one()


def test_unitarity(rng):
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    e1 = pairing_fast(g1, g2)
    e2 = pairing_fast(-g1, g2)
    assert e1 * e2 == Fq12.one()
    assert e1.conjugate() == e2

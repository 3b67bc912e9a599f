"""Curve laws for the oracle (mirrors zkstd's curve_test! macro,
zkstd/src/macros/curve/weierstrass/test.rs) + complete-formula cross-check."""

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import G1_SPEC, G2_SPEC, GRUMPKIN_SPEC

SPECS = [
    pytest.param(G1_SPEC, C.R, id="g1"),
    pytest.param(G2_SPEC, C.R, id="g2"),
    pytest.param(GRUMPKIN_SPEC, C.Q, id="grumpkin"),
]


@pytest.fixture
def scalars(rng):
    return [rng.randrange(1 << 254) for _ in range(4)]


@pytest.mark.parametrize("spec,order", SPECS)
def test_generator_on_curve_and_order(spec, order):
    g = spec.generator
    assert g.is_on_curve()
    assert (order * g).is_infinity
    assert not ((order - 1) * g).is_infinity


@pytest.mark.parametrize("spec,order", SPECS)
def test_group_laws(spec, order, rng):
    g = spec.generator
    a, b = rng.randrange(order), rng.randrange(order)
    p, q = a * g, b * g
    assert (p + q) == (q + p)
    assert p + spec.identity_affine() == p
    assert (p - p).is_infinity
    assert p.double() == p + p
    assert (a + b) % order * g == p + q


@pytest.mark.parametrize("spec,order", SPECS)
def test_complete_projective_matches_affine(spec, order, rng):
    """The branchless RCB16 formulas (what TPU kernels run) vs branchy affine."""
    g = spec.generator
    a, b = rng.randrange(order), rng.randrange(order)
    p, q = a * g, b * g
    pp, qp = p.to_projective(), q.to_projective()

    # generic add
    assert (pp + qp).to_affine() == p + q
    # doubling via both paths: dedicated dbl and add(p, p) (completeness)
    assert pp.double().to_affine() == p.double()
    assert (pp + pp).to_affine() == p.double()
    # identity handling
    ident = spec.identity_projective()
    assert (pp + ident).to_affine() == p
    assert (ident + pp).to_affine() == p
    assert (ident + ident).to_affine().is_infinity
    assert ident.double().to_affine().is_infinity
    # inverse
    assert (pp + (-pp).to_affine().to_projective()).to_affine().is_infinity
    # scalar mul
    k = rng.randrange(order)
    assert (k * pp).to_affine() == k * p

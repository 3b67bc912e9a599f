"""Polynomial helper + error taxonomy parity tests (poly.rs:82-238, error.rs)."""

import random

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.errors import (
    InconsistentPublicInputsLen,
    KogarashiError,
    ProofVerificationError,
    ProverSubVersionCrsAttack,
)
from kogarashi_tpu.groth16.poly import Coefficients, PointsValue
from kogarashi_tpu.pyref import Fr


def _poly(rng, n):
    return Coefficients([Fr(rng.randrange(C.R)) for _ in range(n)])


def test_evaluate_horner(rng):
    f = _poly(rng, 9)
    at = Fr(rng.randrange(C.R))
    want = Fr(sum(c.v * pow(at.v, i, C.R) for i, c in enumerate(f.c)) % C.R)
    assert f.evaluate(at) == want


def test_divide_no_remainder(rng):
    """(f(X) - f(at)) satisfies f(X) - f(at) == divide(f, at) * (X - at)."""
    f = _poly(rng, 8)
    at = Fr(rng.randrange(C.R))
    q = f.divide(at)
    x_minus_at = Coefficients([-at, Fr(1)])
    lhs = f - Coefficients([f.evaluate(at)])
    assert (q * x_minus_at).format_degree() == lhs.format_degree()


def test_vanishing_t():
    tau = Fr(7)
    assert Coefficients.t(16, tau) == Fr(pow(7, 16, C.R) - 1)


def test_commit_is_inner_product(rng):
    f = _poly(rng, 5)
    domain = [Fr(rng.randrange(C.R)) for _ in range(8)]
    got = f.commit(domain)
    want = Fr(sum(a.v * b.v for a, b in zip(f.c, domain[3:])) % C.R)
    assert got == want


def test_blind_preserves_low_degree_evals(rng):
    """Blinding preserves evaluations on the domain where X^n = 1? No — it
    preserves f mod (X^n - 1) shape per poly.rs: b*X^n - b*X^0 vanishes at
    n-th roots of unity."""
    n = 8
    f = _poly(rng, n)
    g = Coefficients(list(f.c)).blind(1, random.Random(1), Fr)
    # at an n-th root of unity w: X^n == 1, so blinded evals match
    w = Fr(pow(C.FR_ROOT_OF_UNITY, (1 << 28) // n, C.R))
    assert w ** n == Fr(1) and w != Fr(1)
    assert g.evaluate(w) == f.evaluate(w)


def test_points_value_ops(rng):
    a = PointsValue([Fr(1), Fr(2)])
    b = PointsValue([Fr(3), Fr(4)])
    assert (a + b).v == [Fr(4), Fr(6)]
    assert (a * b).v == [Fr(3), Fr(8)]
    assert (b - a).v == [Fr(2), Fr(2)]


def test_error_hierarchy():
    assert issubclass(ProverSubVersionCrsAttack, KogarashiError)
    assert issubclass(ProofVerificationError, KogarashiError)
    e = InconsistentPublicInputsLen(3, 5)
    assert e.expected == 3 and e.provided == 5

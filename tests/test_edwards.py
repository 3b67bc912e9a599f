"""Twisted Edwards (Jubjub) tests.

Mirrors zkstd/tests/points.rs (is_on_curve, 2(a+b)=2a+2b, 9b = b+8b) and the
curve-law portions of zkstd/tests/jubjub.rs, plus device-kernel equivalence
vs the pyref oracle and 32-byte compression round-trips.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves.edwards import JUBJUB
from kogarashi_tpu.fields.spec import ints_to_limbs
from kogarashi_tpu.pyref.edwards import (
    JUBJUB_SPEC,
    BlsScalar,
    EdwardsAffine,
    add_affine_point,
    add_mixed_point,
    add_projective_point,
    double_affine_point,
    double_projective_point,
)


def rand_point(rng):
    g = JUBJUB_SPEC.generator.to_extended()
    return (rng.randrange(1, JUBJUB_SPEC.order) * g).to_affine()


# -- pyref oracle laws (zkstd/tests/points.rs) ------------------------------


def test_is_on_curve_affine(rng):
    g = JUBJUB_SPEC.generator
    e = JUBJUB_SPEC.identity_affine()
    a = rand_point(rng)
    b = (a + g).to_affine()
    c = (b.to_extended() + e.to_extended()).to_affine()
    for p in (g, e, a, b, c):
        assert p.is_on_curve()


def test_is_on_curve_extended(rng):
    g = JUBJUB_SPEC.generator.to_extended()
    e = JUBJUB_SPEC.identity_extended()
    a = rand_point(rng).to_extended()
    b = a + g
    c = b + e
    for p in (g, e, a, b, c):
        assert p.is_on_curve()


def test_addition(rng):
    a, b = rand_point(rng), rand_point(rng)
    # 2 * (a + b) == 2a + 2b
    c = double_projective_point(add_affine_point(a, b))
    d = add_projective_point(double_affine_point(a), double_affine_point(b))
    assert c == d
    # mixed add == projective add
    assert add_mixed_point(a, b.to_extended()) == add_projective_point(
        a.to_extended(), b.to_extended()
    )


def test_scalar(rng):
    a = rand_point(rng).to_extended()
    # (8b) + b == 9b
    b = add_projective_point(
        a,
        double_projective_point(double_projective_point(double_projective_point(a))),
    )
    assert b == 9 * a


def test_subgroup_order(rng):
    g = JUBJUB_SPEC.generator.to_extended()
    assert (JUBJUB_SPEC.order * g).is_identity()
    assert not ((JUBJUB_SPEC.order - 1) * g).is_identity()


def test_compression_roundtrip(rng):
    for _ in range(8):
        p = rand_point(rng)
        q = EdwardsAffine.from_bytes(JUBJUB_SPEC, p.to_bytes())
        assert q is not None and q == p
    # identity
    e = JUBJUB_SPEC.identity_affine()
    assert EdwardsAffine.from_bytes(JUBJUB_SPEC, e.to_bytes()) == e


def test_bls_scalar_field_laws(rng):
    # field_test! laws for the jubjub base field (zkstd/tests/jubjub.rs)
    for _ in range(16):
        a, b = BlsScalar.random(rng), BlsScalar.random(rng)
        assert a + b == b + a
        assert a * b == b * a
        assert (a + b).square() == a.square() + (a * b).double() + b.square()
        if not a.is_zero():
            assert a * a.invert() == BlsScalar.one()
    # 2-adicity: root_of_unity has exact order 2^32
    w = BlsScalar(C.BLS_FR_ROOT_OF_UNITY)
    assert w ** (1 << 31) != BlsScalar.one()
    assert w ** (1 << 32) == BlsScalar.one()


# -- device kernels vs oracle ------------------------------------------------


def test_device_add_double_scalar(rng):
    pts = [rand_point(rng) for _ in range(4)]
    dev = JUBJUB.encode_points(pts)
    assert bool(np.asarray(JUBJUB.on_curve(dev)).all())

    out_add = JUBJUB.decode_points(JUBJUB.add(dev, dev))
    out_dbl = JUBJUB.decode_points(JUBJUB.double(dev))
    for p, qa, qd in zip(pts, out_add, out_dbl):
        ref = p.to_extended().double().to_affine()
        assert qa == ref and qd == ref

    ks = [rng.randrange(JUBJUB_SPEC.order) for _ in range(4)]
    res = JUBJUB.decode_points(
        JUBJUB.scalar_mul(dev, jnp.asarray(ints_to_limbs(ks).T))
    )
    for p, k, q in zip(pts, ks, res):
        assert q == (k * p.to_extended()).to_affine()


def test_device_identity_handling(rng):
    # complete formulas: identity lanes flow through the same trace
    p = rand_point(rng)
    e = JUBJUB_SPEC.identity_affine()
    dev = JUBJUB.encode_points([p, e, e])
    out = JUBJUB.decode_points(JUBJUB.add(dev, JUBJUB.encode_points([e, p, e])))
    assert out[0] == p and out[1] == p and out[2] == e

"""Batched curve kernels vs the oracle — bit-for-bit (mirrors curve_test!)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves import G1, G2, GRUMPKIN
from kogarashi_tpu.fields.spec import ints_to_limbs

CURVES = [
    pytest.param(G1, C.R, id="g1"),
    pytest.param(GRUMPKIN, C.Q, id="grumpkin"),
    pytest.param(G2, C.R, id="g2"),
]


def _sample(curve, order, rng, n):
    g = curve.pyref_spec.generator
    pts = [rng.randrange(order) * g for _ in range(n - 1)]
    pts.append(curve.pyref_spec.identity_affine())
    return pts


@pytest.mark.parametrize("curve,order", CURVES)
def test_add_double_vs_oracle(curve, order, rng):
    n = 8
    p_pts = _sample(curve, order, rng, n)
    q_pts = list(reversed(_sample(curve, order, rng, n)))
    p = curve.encode_points(p_pts)
    q = curve.encode_points(q_pts)

    got = curve.decode_points(curve.add(p, q))
    want = [a + b for a, b in zip(p_pts, q_pts)]
    assert got == want

    got = curve.decode_points(curve.double(p))
    assert got == [a.double() for a in p_pts]

    # complete: add(p, p) == double(p), add with identity works
    got = curve.decode_points(curve.add(p, p))
    assert got == [a.double() for a in p_pts]


@pytest.mark.parametrize("curve,order", CURVES)
def test_on_curve_and_roundtrip(curve, order, rng):
    pts = _sample(curve, order, rng, 5)
    p = curve.encode_points(pts)
    assert bool(np.asarray(curve.on_curve(p)).all())
    assert curve.decode_points(p) == pts


@pytest.mark.parametrize("curve,order", CURVES)
def test_scalar_mul_vs_oracle(curve, order, rng):
    n = 4
    pts = _sample(curve, order, rng, n)
    ks = [rng.randrange(order) for _ in range(n - 2)] + [0, 1]
    p = curve.encode_points(pts)
    scalars = jnp.asarray(ints_to_limbs(ks).T)  # (16, n) standard-form limbs
    got = curve.decode_points(curve.scalar_mul(p, scalars))
    assert got == [k * pt for k, pt in zip(ks, pts)]


def test_generator_device(rng):
    for curve in (G1, GRUMPKIN, G2):
        g = curve.generator(batch_ndim=1)
        got = curve.decode_points(g)
        assert got == [curve.pyref_spec.generator]

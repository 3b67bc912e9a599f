"""Limb-suite tests at both widths (zkstd/tests/limbs.rs parity).

The reference runs one macro-generated law suite over 4xu64 (jubjub scalar
field) and 6xu64 (BLS12-381 base field) limbs. Here the widths are 16x16-bit
(BLS12-381 scalar / Jubjub base field) and 24x16-bit (BLS12-381 base field),
exercising the width-parametric Montgomery kernel (fields/mont.py) against
the bigint oracle.
"""

import random

import numpy as np
import pytest

from kogarashi_tpu.fields.mont import Field
from kogarashi_tpu.fields.spec import BLS_FQ, BLS_FR
from kogarashi_tpu.pyref.field import BlsFq
from kogarashi_tpu.pyref.edwards import BlsScalar


@pytest.fixture(params=["bls_fr_16", "bls_fq_24"], scope="module")
def field(request):
    spec = BLS_FR if request.param == "bls_fr_16" else BLS_FQ
    return Field(spec)


def test_limb_laws(field, rng):
    """add/sub/double/mul/square/neg laws (limbs.rs *_test suites)."""
    p = field.spec.p
    n = 8
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    a, b = field.encode(xs), field.encode(ys)
    assert a.shape[0] == field.spec.n_limbs

    # a + b - b == a ; a - a == 0 ; 2a == a + a
    assert field.decode(field.sub(field.add(a, b), b)) == xs
    assert field.decode(field.sub(a, a)) == [0] * n
    assert field.decode(field.double(a)) == field.decode(field.add(a, a))
    # mul commutes, distributes; square == self-mul
    assert field.decode(field.mul(a, b)) == field.decode(field.mul(b, a))
    assert field.decode(field.square(a)) == [x * x % p for x in xs]
    lhs = field.mul(a, field.add(b, b))
    rhs = field.add(field.mul(a, b), field.mul(a, b))
    assert field.decode(lhs) == field.decode(rhs)
    # neg: a + (-a) == 0, -0 == 0
    assert field.decode(field.add(a, field.neg(a))) == [0] * n
    zero = field.encode([0] * n)
    assert field.decode(field.neg(zero)) == [0] * n


def test_invert_and_power(field, rng):
    """invert/power laws (limbs.rs *_invert_test / *_power_test)."""
    p = field.spec.p
    xs = [rng.randrange(1, p) for _ in range(4)]
    a = field.encode(xs)
    inv = field.decode(field.inv(a))
    assert all(i * x % p == 1 for i, x in zip(inv, xs))
    # 0 -> 0 (Fermat convention)
    assert field.decode(field.inv(field.encode([0]))) == [0]


def test_reduce_relaxed_wide(field, rng):
    """Relaxed limbwise-sum reduction at both widths."""
    p = field.spec.p
    xs = [rng.randrange(p) for _ in range(6)]
    a = field.encode(xs)
    rel = a + a + a  # uint32 limbwise sums, no carries
    assert field.decode(field.reduce_relaxed(rel)) == [3 * x % p for x in xs]


def test_serde_roundtrip_both_widths(rng):
    """to_bytes/from_bytes at 32B (bits_256) and 48B (bits_384)."""
    for F, nb in ((BlsScalar, 32), (BlsFq, 48)):
        x = F.random(rng)
        b = x.to_bytes()
        assert len(b) == nb
        assert F.from_bytes(b) == x
        # non-canonical bytes rejected
        assert F.from_bytes((F.p + 1).to_bytes(nb, "little")) is None
        # wide reduction
        wide = rng.randrange(1 << (16 * nb - 5)).to_bytes(2 * nb, "little")
        assert F.from_bytes_wide(wide).v == int.from_bytes(wide, "little") % F.p

"""JAX field layer vs the pure-Python oracle — bit-for-bit.

Layout: limb-major (16, *batch) uint32.
"""

import numpy as np
import pytest

from kogarashi_tpu.fields import FQ_OPS, FR_OPS, N_LIMBS

BATCH = 64


@pytest.fixture(params=["fr", "fq"])
def fld(request):
    return {"fr": FR_OPS, "fq": FQ_OPS}[request.param]


def _rand_vals(rng, p, n=BATCH):
    return [rng.randrange(p) for _ in range(n - 3)] + [0, 1, p - 1]


def test_encode_decode_roundtrip(fld, rng):
    vals = _rand_vals(rng, fld.spec.p)
    arr = fld.encode(vals)
    assert arr.shape == (N_LIMBS, BATCH)
    assert fld.decode(arr) == vals


def test_add_sub_neg_double(fld, rng):
    p = fld.spec.p
    a_v, b_v = _rand_vals(rng, p), list(reversed(_rand_vals(rng, p)))
    a, b = fld.encode(a_v), fld.encode(b_v)
    assert fld.decode(fld.add(a, b)) == [(x + y) % p for x, y in zip(a_v, b_v)]
    assert fld.decode(fld.sub(a, b)) == [(x - y) % p for x, y in zip(a_v, b_v)]
    assert fld.decode(fld.neg(a)) == [(-x) % p for x in a_v]
    assert fld.decode(fld.double(a)) == [2 * x % p for x in a_v]


def test_mul_square(fld, rng):
    p = fld.spec.p
    a_v, b_v = _rand_vals(rng, p), list(reversed(_rand_vals(rng, p)))
    a, b = fld.encode(a_v), fld.encode(b_v)
    assert fld.decode(fld.mul(a, b)) == [x * y % p for x, y in zip(a_v, b_v)]
    assert fld.decode(fld.square(a)) == [x * x % p for x in a_v]


def test_inv(fld, rng):
    p = fld.spec.p
    a_v = [rng.randrange(1, p) for _ in range(8)] + [0]
    a = fld.encode(a_v)
    got = fld.decode(fld.inv(a))
    for x, y in zip(a_v, got):
        if x == 0:
            assert y == 0
        else:
            assert x * y % p == 1


def test_mont_std_roundtrip(fld, rng):
    p = fld.spec.p
    a_v = _rand_vals(rng, p, 8)
    a = fld.encode(a_v)
    std = fld.to_std(a)
    from kogarashi_tpu.fields import limbs_to_ints

    assert limbs_to_ints(np.asarray(std).T) == a_v
    assert fld.decode(fld.to_mont(std)) == a_v


def test_reduce_relaxed_segment_sum(fld, rng):
    """Sum 500 field elements limbwise in raw uint32, reduce once — exact."""
    p = fld.spec.p
    vals = [rng.randrange(p) for _ in range(500)]
    arr = np.asarray(fld.encode(vals), dtype=np.uint64)  # (16, 500)
    relaxed = arr.sum(axis=1, dtype=np.uint64)
    assert relaxed.max() < 2**32
    import jax.numpy as jnp

    out = fld.reduce_relaxed(jnp.asarray(relaxed.astype(np.uint32))[:, None])
    assert fld.decode(out) == [sum(vals) % p]


def test_mul_accepts_nonreduced_lhs(fld):
    """montmul(a, b) must be valid for any a < 2^256 when b < p (used by
    reduce_relaxed / to_mont on raw 256-bit inputs)."""
    big = (1 << 256) - 1
    import jax.numpy as jnp
    from kogarashi_tpu.fields import int_to_limbs

    a = jnp.asarray(int_to_limbs(big))[:, None]
    out = fld.to_mont(a)
    assert fld.decode(out) == [big % fld.spec.p]


def test_batch_shapes(fld, rng):
    """Ops are shape-polymorphic over trailing batch axes."""
    p = fld.spec.p
    vals = [rng.randrange(p) for _ in range(12)]
    a = fld.encode(vals).reshape(N_LIMBS, 3, 4)
    out = fld.mul(a, a)
    assert out.shape == (N_LIMBS, 3, 4)
    assert fld.decode(out) == [v * v % p for v in vals]

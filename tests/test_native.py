"""Native (C++) host runtime vs pure-Python oracles — bit-exact equivalence.

The native module is the analogue of the reference's inline-asm limb layer
(zkstd/src/arithmetic/limbs/bits_256/assembly.rs), which the reference tests
by running the same law suite over both implementations (tests/limbs.rs runs
whichever cfg selects). Here both paths are always present, so every op is
compared directly.
"""

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu import native as N
from kogarashi_tpu.pyref.field import Fq, Fr
from kogarashi_tpu.pyref.mimc import Mimc, MimcRO, mimc_constants

pytestmark = pytest.mark.skipif(not N.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("p", [C.R, C.Q], ids=["Fr", "Fq"])
def test_vec_ops(rng, p):
    xs = [rng.randrange(p) for _ in range(64)] + [0, 1, p - 1]
    ys = [rng.randrange(p) for _ in range(64)] + [p - 1, p - 1, p - 1]
    assert N.vec_add(xs, ys, p) == [(x + y) % p for x, y in zip(xs, ys)]
    assert N.vec_sub(xs, ys, p) == [(x - y) % p for x, y in zip(xs, ys)]
    assert N.vec_mul(xs, ys, p) == [x * y % p for x, y in zip(xs, ys)]
    k = rng.randrange(p)
    assert N.vec_scale(xs, k, p) == [x * k % p for x in xs]


def test_spmv_and_csr(rng):
    p = C.R
    n_rows, n_cols = 40, 30
    indptr, indices, data = [0], [], []
    for _ in range(n_rows):
        for _ in range(rng.randrange(0, 5)):
            indices.append(rng.randrange(n_cols))
            data.append(rng.randrange(p))
        indptr.append(len(indices))
    z = [rng.randrange(p) for _ in range(n_cols)]
    want = [
        sum(data[j] * z[indices[j]] for j in range(indptr[r], indptr[r + 1])) % p
        for r in range(n_rows)
    ]
    assert N.spmv(indptr, indices, data, z, p) == want
    csr = N.CSR(indptr, indices, data, p)
    assert csr.mv(z) == want
    # reuse with a different z (the cached-matrix contract)
    z2 = [rng.randrange(p) for _ in range(n_cols)]
    want2 = [
        sum(data[j] * z2[indices[j]] for j in range(indptr[r], indptr[r + 1])) % p
        for r in range(n_rows)
    ]
    assert csr.mv(z2) == want2


def test_r1cs_residual(rng):
    p = C.Q
    n = 33
    az = [rng.randrange(p) for _ in range(n)]
    bz = [rng.randrange(p) for _ in range(n)]
    cz = [rng.randrange(p) for _ in range(n)]
    e = [rng.randrange(p) for _ in range(n)]
    u = rng.randrange(p)
    want = [(a * b - u * c - ee) % p for a, b, c, ee in zip(az, bz, cz, e)]
    assert N.r1cs_residual(az, bz, cz, u, e, p) == want


@pytest.mark.parametrize("F", [Fr, Fq], ids=["Fr", "Fq"])
def test_mimc_hash_matches_oracle(rng, F):
    m = Mimc(F)
    cts = [c.v for c in m.constants]
    for _ in range(4):
        xl, xr = rng.randrange(F.p), rng.randrange(F.p)
        assert N.mimc_hash(xl, xr, cts, F.p) == m.hash(F(xl), F(xr)).v


def test_mimc_sponge_matches_pure_fold(rng):
    """native sponge == the pure-Python fold (the squeeze fast path)."""
    cts = [c.v for c in mimc_constants(Fq)]
    state = [rng.randrange(Fq.p) for _ in range(11)]
    acc = Fq.zero()
    m = Mimc(Fq)
    for s in state:
        h = m.hash(Fq(s), acc)
        acc = acc + Fq(s) + h
    assert N.mimc_sponge(state, cts, Fq.p) == acc.v
    # empty state
    assert N.mimc_sponge([], cts, Fq.p) == 0


def test_shape_prod_native_matches_python(rng):
    """R1csShape._prod native CSR path == pure fallback on a real circuit."""
    from kogarashi_tpu.nova.relaxed_r1cs import R1csShape
    from kogarashi_tpu.r1cs import BN254_DRIVER, FieldAssignment, R1CS

    cs = R1CS(BN254_DRIVER)
    x = FieldAssignment.instance(cs, 3)
    o = FieldAssignment.instance(cs, 35)
    c5 = FieldAssignment.constant(cs, 5)
    s1 = FieldAssignment.mul(cs, x, x)
    y = FieldAssignment.mul(cs, s1, x)
    s2 = FieldAssignment.add(cs, y, x)
    FieldAssignment.enforce_eq(cs, s2 + c5, o)

    shape = R1csShape.from_r1cs(cs)
    p = shape.p
    l = shape.l() + 1
    z = [1] + list(cs.x[1:]) + list(cs.w)
    for rows in (shape.a, shape.b, shape.c):
        native_out = shape._prod(rows, z, l)
        pure = []
        for row in rows:
            s = 0
            for (kind, i), coeff in row.terms.items():
                v = z[i] if kind == "x" else z[i + l]
                s += coeff * v
            pure.append(s % p)
        assert native_out == pure

"""R1CS + gadget tests (mirrors zkstd r1cs/test.rs and nova/src/driver.rs
gadget tests: native-vs-circuit equivalence, negative cases)."""

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import Fq, Fr
from kogarashi_tpu.r1cs import (
    BN254_DRIVER,
    GRUMPKIN_DRIVER,
    BinaryAssignment,
    FieldAssignment,
    LinComb,
    PointAssignment,
    R1CS,
)


def example_circuit(cs, x_val, o_val):
    """x^3 + x + 5 = o (zkstd/src/r1cs/test.rs:53-85)."""
    x = FieldAssignment.instance(cs, x_val)
    o = FieldAssignment.instance(cs, o_val)
    c5 = FieldAssignment.constant(cs, 5)
    sym1 = FieldAssignment.mul(cs, x, x)
    y = FieldAssignment.mul(cs, sym1, x)
    sym2 = FieldAssignment.add(cs, y, x)
    FieldAssignment.enforce_eq(cs, (sym2 + c5), o)
    return cs


def test_example_r1cs_sat():
    cs = R1CS(BN254_DRIVER)
    example_circuit(cs, 3, 35)
    assert cs.is_sat()
    assert cs.m > 0


def test_example_r1cs_unsat():
    cs = R1CS(BN254_DRIVER)
    example_circuit(cs, 3, 36)
    assert not cs.is_sat()


def test_add_mul_constant_folding(rng):
    cs = R1CS(BN254_DRIVER)
    a = FieldAssignment.witness(cs, 7)
    c = FieldAssignment.constant(cs, 3)
    m0 = cs.m
    prod = FieldAssignment.mul(cs, a, c)  # no gate appended
    assert cs.m == m0
    assert prod.value(cs) == 21
    s = FieldAssignment.add(cs, a, c)
    assert cs.m == m0
    assert s.value(cs) == 10


@pytest.mark.parametrize("driver", [BN254_DRIVER, GRUMPKIN_DRIVER], ids=["bn254", "grumpkin"])
def test_point_gadget_matches_native(driver, rng):
    spec = driver.curve
    order = driver.base.p  # in-circuit curve's scalar field = driver base
    g = spec.generator
    p_native = rng.randrange(order) * g
    q_native = rng.randrange(order) * g

    cs = R1CS(driver)
    p = PointAssignment.witness(cs, p_native.x.v, p_native.y.v, p_native.is_infinity)
    q = PointAssignment.witness(cs, q_native.x.v, q_native.y.v, q_native.is_infinity)

    assert p.add(cs, q).value(cs) == p_native + q_native
    assert p.double(cs).value(cs) == p_native.double()
    assert p.add(cs, p).value(cs) == p_native.double()  # completeness
    ident = PointAssignment.identity(cs)
    assert p.add(cs, ident).value(cs) == p_native
    assert cs.is_sat()


def test_point_scalar_mul_circuit(rng):
    driver = BN254_DRIVER
    g = driver.curve.generator
    k = rng.randrange(1 << 128)
    cs = R1CS(driver)
    p = PointAssignment.witness(cs, g.x.v, g.y.v, False)
    s = FieldAssignment.witness(cs, k)
    got = p.scalar_point(cs, s).value(cs)
    assert got == k * g
    assert cs.is_sat()


def test_range_check_positive_negative():
    # value fits in 8 bits
    cs = R1CS(BN254_DRIVER)
    v = 200
    bits = [BinaryAssignment.witness(cs, (v >> (7 - i)) & 1) for i in range(8)]
    FieldAssignment.range_check_bits(cs, bits, 8)
    assert cs.is_sat()

    # non-boolean "bit" must fail
    cs = R1CS(BN254_DRIVER)
    bits = [BinaryAssignment.witness(cs, 2)] + [
        BinaryAssignment.witness(cs, 0) for _ in range(7)
    ]
    FieldAssignment.range_check_bits(cs, bits, 8)
    assert not cs.is_sat()


def test_range_check_against_constant():
    # <= 180 passes for 170, fails for 200
    for v, ok in [(170, True), (180, True), (200, False)]:
        cs = R1CS(BN254_DRIVER)
        bits = [BinaryAssignment.witness(cs, (v >> (7 - i)) & 1) for i in range(8)]
        FieldAssignment.range_check(cs, bits, 180)
        assert cs.is_sat() == ok, v


def test_to_bits_and_enforce_eq_bits(rng):
    cs = R1CS(BN254_DRIVER)
    v = rng.randrange(C.R)
    x = FieldAssignment.witness(cs, v)
    bits = FieldAssignment.to_bits(cs, x, 256)
    assert len(bits) == 256
    got = 0
    for b in bits:
        got = (got << 1) | b.value(cs)
    assert got == v
    FieldAssignment.enforce_eq_bits(cs, x, bits)
    assert cs.is_sat()


def test_is_eq_conditional_select(rng):
    cs = R1CS(BN254_DRIVER)
    a = FieldAssignment.witness(cs, 5)
    b = FieldAssignment.witness(cs, 5)
    d = FieldAssignment.witness(cs, 9)
    assert FieldAssignment.is_eq(cs, a, b).value(cs) == 1
    assert FieldAssignment.is_eq(cs, a, d).value(cs) == 0
    bit = BinaryAssignment.witness(cs, 1)
    sel = FieldAssignment.conditional_select(cs, a, d, bit)
    assert sel.value(cs) == 5
    bit0 = BinaryAssignment.witness(cs, 0)
    sel0 = FieldAssignment.conditional_select(cs, a, d, bit0)
    assert sel0.value(cs) == 9
    assert cs.is_sat()


def test_inputize_and_wire_indexing():
    cs = R1CS(BN254_DRIVER)
    w = FieldAssignment.witness(cs, 42)
    xi = FieldAssignment.inputize(cs, w)
    assert xi.value(cs) == 42
    assert cs.l() == 2  # [1, 42]
    assert cs.x[1] == 42


def test_matrices_coo_roundtrip():
    cs = R1CS(BN254_DRIVER)
    example_circuit(cs, 3, 35)
    (ra, ca, va), (rb, cb, vb), (rc, cc, vc) = cs.matrices_coo()
    z = cs.z_ints()
    p = cs.p
    m = cs.m
    az = [0] * m
    bz = [0] * m
    czv = [0] * m
    for r, c_, v in zip(ra, ca, va):
        az[r] = (az[r] + v * z[c_]) % p
    for r, c_, v in zip(rb, cb, vb):
        bz[r] = (bz[r] + v * z[c_]) % p
    for r, c_, v in zip(rc, cc, vc):
        czv[r] = (czv[r] + v * z[c_]) % p
    assert all(a * b % p == c_ for a, b, c_ in zip(az, bz, czv))

"""Nova gadget tests: circuit-vs-native equivalence (mirrors the reference's
gadget test modules in nova/src/)."""

import random

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.nova.gadgets.bignat import (
    BN_LIMB_WIDTH,
    BN_N_LIMBS,
    BigNatAssignment,
)
from kogarashi_tpu.nova.gadgets.mimc import MimcROCircuit
from kogarashi_tpu.nova.gadgets.instance import RelaxedR1csInstanceAssignment
from kogarashi_tpu.nova.relaxed_r1cs import RelaxedR1csInstance
from kogarashi_tpu.pyref import Fq, Fr, GRUMPKIN_SPEC, MimcRO
from kogarashi_tpu.r1cs import (
    BN254_DRIVER,
    GRUMPKIN_DRIVER,
    FieldAssignment,
    PointAssignment,
    R1CS,
)
from kogarashi_tpu.r1cs.driver import scalar_as_base


def test_mimc_circuit_matches_native(rng):
    """transcript.rs:72-96."""
    mimc = MimcRO(Fr, Fq)  # GrumpkinDriver: Base=Fr, Scalar=Fq
    cs = R1CS(BN254_DRIVER)
    circuit = MimcROCircuit(Fr)

    point = rng.randrange(C.Q) * GRUMPKIN_SPEC.generator
    scalar = rng.randrange(C.R)

    pa = PointAssignment.instance(cs, point)
    sa = FieldAssignment.instance(cs, scalar)
    mimc.append(Fr(scalar))
    mimc.append_point(point)
    circuit.append(sa)
    circuit.append_point(pa)

    expected = mimc.squeeze(C.HASH_BITS).v
    got = circuit.squeeze(cs, C.HASH_BITS)
    FieldAssignment.enforce_eq_constant(cs, got, expected)
    assert got.value(cs) == expected
    assert cs.is_sat()


def test_bignat_roundtrip_and_add(rng):
    cs = R1CS(BN254_DRIVER)
    a_val = rng.randrange(1 << 255)
    b_val = rng.randrange(1 << 255)
    a = BigNatAssignment.witness_from_big_int(cs, a_val, BN_LIMB_WIDTH, BN_N_LIMBS)
    b = BigNatAssignment.witness_from_big_int(cs, b_val, BN_LIMB_WIDTH, BN_N_LIMBS)
    assert a.value(cs) == a_val
    s = a.add(b)
    assert s.value(cs) == a_val + b_val
    assert cs.is_sat()


def test_bignat_mult_mod_red_mod(rng):
    cs = R1CS(BN254_DRIVER)
    m_val = C.Q  # non-native modulus
    a_val = rng.randrange(m_val)
    b_val = rng.randrange(m_val)
    a = BigNatAssignment.witness_from_big_int(cs, a_val, BN_LIMB_WIDTH, BN_N_LIMBS)
    b = BigNatAssignment.witness_from_big_int(cs, b_val, BN_LIMB_WIDTH, BN_N_LIMBS)
    m = BigNatAssignment.witness_from_big_int(cs, m_val, BN_LIMB_WIDTH, BN_N_LIMBS)
    prod = a.mult_mod(cs, b, m)
    assert prod.value(cs) == a_val * b_val % m_val
    assert cs.is_sat()

    red = a.add(b).red_mod(cs, m)
    assert red.value(cs) == (a_val + b_val) % m_val
    assert cs.is_sat()


def test_bignat_from_field_assignment(rng):
    cs = R1CS(BN254_DRIVER)
    v = rng.randrange(C.R)
    f = FieldAssignment.witness(cs, v)
    bn = BigNatAssignment.witness_from_field_assignment(cs, f, BN_LIMB_WIDTH, BN_N_LIMBS)
    assert bn.value(cs) == v
    assert cs.is_sat()


def test_relaxed_instance_hash_circuit_matches_native(rng):
    """relaxed_instance.rs:150 instance_assignment_hash."""
    e2 = GRUMPKIN_DRIVER
    g = GRUMPKIN_SPEC.generator
    instance = RelaxedR1csInstance(
        driver=e2,
        commit_e=rng.randrange(C.Q) * g,
        commit_w=rng.randrange(C.Q) * g,
        u=rng.randrange(C.Q),
        x=[rng.randrange(C.Q) for _ in range(2)],
    )
    i = 3
    z0 = [3]
    zi = [3]
    expected = instance.hash(i, z0, zi)  # Fq value

    cs = R1CS(BN254_DRIVER)
    i_a = FieldAssignment.witness(cs, i)
    z0_a = [FieldAssignment.witness(cs, v) for v in z0]
    zi_a = [FieldAssignment.witness(cs, v) for v in zi]
    inst_a = RelaxedR1csInstanceAssignment.witness(cs, e2, instance)
    got = inst_a.hash(cs, i_a, z0_a, zi_a)
    # circuit value lives in Fr; native hash is squeezed into Fq then
    # reinterpreted via scalar_as_base for comparison
    assert got.value(cs) == scalar_as_base(e2, expected)
    assert cs.is_sat()


def test_relaxed_instance_hash_identity_commits():
    """Dummy instance (identity commitments) must hash consistently too —
    exercises the (0, 1, inf) identity representation through descale."""
    e2 = GRUMPKIN_DRIVER
    instance = RelaxedR1csInstance.dummy(e2, 2)
    expected = instance.hash(0, [0], [0])

    cs = R1CS(BN254_DRIVER)
    i_a = FieldAssignment.witness(cs, 0)
    z = [FieldAssignment.witness(cs, 0)]
    inst_a = RelaxedR1csInstanceAssignment.witness(cs, e2, instance)
    got = inst_a.hash(cs, i_a, z, list(z))
    assert got.value(cs) == scalar_as_base(e2, expected)
    assert cs.is_sat()

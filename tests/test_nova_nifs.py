"""NIFS folding tests (mirrors nova/src/prover.rs:117-178 nifs_folding_test
and verifier.rs recursive folding)."""

import random

import pytest

from kogarashi_tpu.nova.nifs import NifsProver, NifsVerifier
from kogarashi_tpu.nova.pedersen import PedersenCommitment
from kogarashi_tpu.nova.relaxed_r1cs import (
    R1csShape,
    RelaxedR1csInstance,
    RelaxedR1csWitness,
    r1cs_instance_and_witness,
)
from kogarashi_tpu.r1cs import FieldAssignment, GRUMPKIN_DRIVER, R1CS


def example_r1cs(driver, x_val: int) -> R1CS:
    """x^3 + x + 5 = o over the driver's scalar field (zkstd r1cs/test.rs)."""
    p = driver.scalar.p
    cs = R1CS(driver)
    o_val = (x_val**3 + x_val + 5) % p
    x = FieldAssignment.instance(cs, x_val)
    o = FieldAssignment.instance(cs, o_val)
    c5 = FieldAssignment.constant(cs, 5)
    sym1 = FieldAssignment.mul(cs, x, x)
    y = FieldAssignment.mul(cs, sym1, x)
    sym2 = FieldAssignment.add(cs, y, x)
    FieldAssignment.enforce_eq(cs, sym2 + c5, o)
    return cs


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(11)
    driver = GRUMPKIN_DRIVER
    r1cs_1 = example_r1cs(driver, 4)
    shape = R1csShape.from_r1cs(r1cs_1)
    k = max((shape.m - 1).bit_length(), 1)
    ck = PedersenCommitment(driver.commit_curve, k, rng)
    return driver, shape, ck, r1cs_1


@pytest.mark.slow
def test_nifs_folding(setup):
    driver, shape, ck, r1cs_1 = setup
    p = shape.p
    r1cs_2 = example_r1cs(driver, 3)

    x1, w1 = r1cs_instance_and_witness(r1cs_1, shape, ck)
    instance1 = RelaxedR1csInstance.from_r1cs_instance(driver, x1)
    witness1 = RelaxedR1csWitness.from_r1cs_witness(shape, w1)
    instance2, witness2 = r1cs_instance_and_witness(r1cs_2, shape, ck)

    prover = NifsProver(shape, ck)
    folded_instance, folded_witness, commit_t = prover.prove(
        instance1, witness1, instance2, witness2
    )
    verified_instance = NifsVerifier.verify(commit_t, instance1, instance2)
    assert folded_instance == verified_instance

    # sat before and after folding
    assert shape.is_sat_relaxed(instance1, witness1)
    assert shape.is_sat(ck, instance2, witness2)
    assert shape.is_sat_relaxed(folded_instance, folded_witness)

    # algebraic identities: z3 = z1 + r z2, E-commit = r*T
    from kogarashi_tpu.pyref import MimcRO
    from kogarashi_tpu import constants as C

    t = prover.compute_cross_term(instance1, witness1, instance2, witness2)
    tr = MimcRO(driver.base, driver.scalar)
    tr.append_point(commit_t)
    instance1.absorb_by_transcript(tr)
    r = tr.squeeze(C.CHALLENGE_BITS).v

    z1 = [instance1.u] + list(instance1.x) + list(witness1.w)
    z2 = [1] + list(instance2.x) + list(witness2.w)
    z3 = (
        [folded_instance.u]
        + list(folded_instance.x)
        + list(folded_witness.w)
    )
    assert z3 == [(a + r * b) % p for a, b in zip(z1, z2)]
    assert folded_instance.commit_e == r * commit_t
    assert folded_witness.e == [v * r % p for v in t]


@pytest.mark.slow
def test_recursive_folding_chain(setup):
    """10 rounds of folding keep the running instance satisfiable
    (mirrors nova/src/verifier.rs:39-66)."""
    driver, shape, ck, r1cs_1 = setup
    x1, w1 = r1cs_instance_and_witness(r1cs_1, shape, ck)
    running_i = RelaxedR1csInstance.from_r1cs_instance(driver, x1)
    running_w = RelaxedR1csWitness.from_r1cs_witness(shape, w1)
    prover = NifsProver(shape, ck)
    for step in range(2, 8):
        cs = example_r1cs(driver, step)
        inst, wit = r1cs_instance_and_witness(cs, shape, ck)
        running_i, running_w, _ = prover.prove(running_i, running_w, inst, wit)
        assert shape.is_sat_relaxed(running_i, running_w)


def test_pedersen_device_matches_host(setup):
    driver, shape, ck, _ = setup
    rng = random.Random(5)
    m = [rng.randrange(driver.scalar.p) for _ in range(3)]
    assert ck.commit(m) == ck.commit_host(m)

"""Groth16 end-to-end (mirrors groth16/src/lib.rs:28-77 and
groth16/examples/simple.rs: x^3 + x + 5 = o)."""

import random

import pytest

from kogarashi_tpu.groth16 import Circuit, setup
from kogarashi_tpu.r1cs import FieldAssignment


class DummyCircuit(Circuit):
    def __init__(self, x=0, o=0):
        self.x_val = x
        self.o_val = o

    def synthesize(self, cs):
        x = FieldAssignment.instance(cs, self.x_val)
        o = FieldAssignment.instance(cs, self.o_val)
        c5 = FieldAssignment.constant(cs, 5)
        sym1 = FieldAssignment.mul(cs, x, x)
        y = FieldAssignment.mul(cs, sym1, x)
        sym2 = FieldAssignment.add(cs, y, x)
        FieldAssignment.enforce_eq(cs, sym2 + c5, o)


@pytest.fixture(scope="module")
def keys():
    return setup(DummyCircuit(), random.Random(42))


@pytest.mark.slow
def test_prove_verify_roundtrip(keys):
    prover, verifier = keys
    proof = prover.create_proof(DummyCircuit(x=3, o=35), random.Random(7))
    assert verifier.verify(proof, [3, 35])


@pytest.mark.slow
def test_verify_rejects_wrong_inputs(keys):
    prover, verifier = keys
    proof = prover.create_proof(DummyCircuit(x=3, o=35), random.Random(7))
    assert not verifier.verify(proof, [3, 36])
    assert not verifier.verify(proof, [4, 35])


@pytest.mark.slow
def test_verify_rejects_tampered_proof(keys):
    prover, verifier = keys
    proof = prover.create_proof(DummyCircuit(x=3, o=35), random.Random(7))
    proof.a = proof.a + proof.a.spec.generator
    assert not verifier.verify(proof, [3, 35])


@pytest.mark.slow
def test_different_witness_same_statement(keys):
    """x=2 -> o=15; proofs for different instances verify independently."""
    prover, verifier = keys
    proof = prover.create_proof(DummyCircuit(x=2, o=15), random.Random(9))
    assert verifier.verify(proof, [2, 15])
    assert not verifier.verify(proof, [3, 35])


@pytest.mark.slow
def test_error_taxonomy_wired(keys):
    """Negative paths raise the reference's error variants
    (groth16/src/error.rs:1-8)."""
    from kogarashi_tpu.errors import (
        InconsistentPublicInputsLen,
        ProverSubVersionCrsAttack,
    )

    prover, verifier = keys
    proof = prover.create_proof(DummyCircuit(x=3, o=35), random.Random(7))
    with pytest.raises(InconsistentPublicInputsLen):
        verifier.verify(proof, [3, 35, 1])
    # subverted CRS: delta forced to identity
    import copy

    bad = copy.copy(prover)
    bad.params = copy.copy(prover.params)
    bad.params.vk = copy.copy(prover.params.vk)
    bad.params.vk.delta_g1 = proof.a.spec.identity_affine()
    with pytest.raises(ProverSubVersionCrsAttack):
        bad.create_proof(DummyCircuit(x=3, o=35), random.Random(7))


def test_nifs_shape_validation():
    from kogarashi_tpu.errors import MalformedProof
    from kogarashi_tpu.nova.nifs import NifsProver

    class _Inst:
        def __init__(self, x):
            self.x = x

    class _Wit:
        def __init__(self, w):
            self.w = w

    prover = NifsProver.__new__(NifsProver)
    with pytest.raises(MalformedProof):
        prover.prove(_Inst([1, 2]), _Wit([1]), _Inst([1]), _Wit([1]))
    with pytest.raises(MalformedProof):
        prover.prove(_Inst([1, 2]), _Wit([1]), _Inst([3, 4]), _Wit([1, 2]))

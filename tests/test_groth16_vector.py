"""VecR1CS square-chain circuit through the full Groth16 pipeline (the
small-scale twin of benches/groth16_large.py — same code path the 2^20 chip
run exercises; reference pipeline: groth16/src/zksnark.rs + prover.rs)."""

import random

import pytest

from kogarashi_tpu.groth16 import setup
from kogarashi_tpu.r1cs.vector import SquareChainCircuit, VecR1CS


def test_square_chain_shape_and_sat():
    c = SquareChainCircuit(64, x0=5)
    cs = c.build()
    assert cs.m == 64
    assert cs.l() + cs.m_l_1() == 64  # wires == constraints by construction
    assert cs.is_sat()
    # tamper: break an intermediate wire
    cs.w[3] = (cs.w[3] + 1) % cs.p
    assert not cs.is_sat()


@pytest.mark.slow
@pytest.mark.nightly
def test_square_chain_prove_verify():
    circuit = SquareChainCircuit(64, x0=7)
    prover, verifier = setup(circuit, random.Random(11))
    proof = prover.create_proof(circuit, random.Random(12))
    cs = circuit.build()
    assert verifier.verify(proof, cs.x[1:])
    bad = list(cs.x[1:])
    bad[-1] = (bad[-1] + 1) % cs.p
    assert not verifier.verify(proof, bad)

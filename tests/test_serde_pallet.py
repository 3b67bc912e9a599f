"""Serialization + pallet layer tests (parity: SCALE codec round-trips,
pallet/nova dispatchable behavior, sample pallet coupling)."""

import random

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.nova.relaxed_r1cs import (
    R1csInstance,
    R1csWitness,
    RelaxedR1csInstance,
    RelaxedR1csWitness,
)
from kogarashi_tpu.nova.proof import RecursiveProof
from kogarashi_tpu.pallet import NovaPallet, SamplePallet
from kogarashi_tpu.pyref import G1_SPEC, GRUMPKIN_SPEC
from kogarashi_tpu.r1cs import BN254_DRIVER, GRUMPKIN_DRIVER
from kogarashi_tpu.utils.serde import (
    Codec,
    Decoder,
    decode_recursive_proof,
    encode_recursive_proof,
)


def test_compact_roundtrip():
    for n in [0, 1, 63, 64, 16383, 16384, (1 << 30) - 1, 1 << 30, 1 << 40, 1 << 70]:
        c = Codec().compact(n)
        assert Decoder(c.bytes()).compact() == n


def test_field_and_point_roundtrip(rng):
    c = Codec()
    v = rng.randrange(C.Q)
    c.field(v, C.Q)
    pt = rng.randrange(C.R) * G1_SPEC.generator
    c.point(pt)
    c.point(G1_SPEC.identity_affine())
    d = Decoder(c.bytes())
    assert d.field(C.Q) == v
    assert d.point(G1_SPEC) == pt
    assert d.point(G1_SPEC).is_infinity


def _dummy_proof(rng):
    e1, e2 = BN254_DRIVER, GRUMPKIN_DRIVER
    g1 = G1_SPEC.generator
    gg = GRUMPKIN_SPEC.generator
    return RecursiveProof(
        i=3,
        z0_primary=[0],
        z0_secondary=[0],
        zi_primary=[rng.randrange(C.R)],
        zi_secondary=[rng.randrange(C.Q)],
        u_single_secondary=R1csInstance(
            commit_w=rng.randrange(C.R) * gg, x=[rng.randrange(C.Q), 1]
        ),
        w_single_secondary=R1csWitness(w=[rng.randrange(C.Q) for _ in range(4)]),
        u_range_primary=RelaxedR1csInstance(
            driver=e1,
            commit_w=rng.randrange(C.R) * g1,
            commit_e=rng.randrange(C.R) * g1,
            u=rng.randrange(C.R),
            x=[rng.randrange(C.R), 2],
        ),
        w_range_primary=RelaxedR1csWitness(
            w=[rng.randrange(C.R) for _ in range(4)], e=[rng.randrange(C.R)] * 3
        ),
        u_range_secondary=RelaxedR1csInstance.dummy(e2, 2),
        w_range_secondary=RelaxedR1csWitness.dummy(4, 3),
    )


def test_recursive_proof_roundtrip(rng):
    proof = _dummy_proof(rng)
    data = encode_recursive_proof(proof)
    back = decode_recursive_proof(data)
    assert back.i == proof.i
    assert back.zi_primary == proof.zi_primary
    assert back.u_single_secondary.commit_w == proof.u_single_secondary.commit_w
    assert back.u_range_primary.u == proof.u_range_primary.u
    assert back.u_range_primary.commit_e == proof.u_range_primary.commit_e
    assert back.w_range_primary.e == proof.w_range_primary.e
    assert back.u_range_secondary.commit_w.is_infinity
    assert encode_recursive_proof(back) == data


def test_pallet_dispatch(rng):
    """Invalid proofs are rejected; sample pallet only mutates on success."""

    class AlwaysBadPP:
        shape_primary = None

    proof = _dummy_proof(rng)

    class FakePP:
        pass

    # a structurally valid but unsatisfiable proof must fail verification
    pallet = NovaPallet()

    class PP:
        class shape_primary:
            @staticmethod
            def is_sat_relaxed(i, w):
                return False

    # hash checks fail before sat checks for this random proof, so verify()
    # returns False without touching shapes
    ok = pallet.verify("alice", proof, PP)
    assert not ok
    assert pallet.events[-1] == ("InvalidProof", "alice")

    sample = SamplePallet()
    assert not sample.set_thing_1("bob", 42, proof, PP)
    assert sample.thing == 0


def test_groth16_proof_roundtrip(rng):
    from kogarashi_tpu.pyref import G2_SPEC
    from kogarashi_tpu.utils.serde import (
        decode_groth16_proof,
        encode_groth16_proof,
    )
    from kogarashi_tpu.groth16.keys import Proof

    proof = Proof(
        a=rng.randrange(C.R) * G1_SPEC.generator,
        b=rng.randrange(C.R) * G2_SPEC.generator,
        c=rng.randrange(C.R) * G1_SPEC.generator,
    )
    data = encode_groth16_proof(proof)
    back = decode_groth16_proof(data)
    assert back.a == proof.a and back.b == proof.b and back.c == proof.c

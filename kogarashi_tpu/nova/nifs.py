"""NIFS folding scheme: prover computes the cross term and folds;
verifier recomputes the challenge and folds instances only.

Parity: nova/src/prover.rs (Prover, compute_cross_term), verifier.rs.
"""

from __future__ import annotations

from ..errors import MalformedProof
from ..pyref import MimcRO
from .. import constants as C
from .pedersen import PedersenCommitment
from .relaxed_r1cs import (
    R1csInstance,
    R1csShape,
    R1csWitness,
    RelaxedR1csInstance,
    RelaxedR1csWitness,
)


def _transcript(driver) -> MimcRO:
    return MimcRO(driver.base, driver.scalar)


class NifsProver:
    def __init__(self, shape: R1csShape, ck: PedersenCommitment):
        self.shape = shape
        self.ck = ck

    def prove(
        self,
        instance1: RelaxedR1csInstance,
        witness1: RelaxedR1csWitness,
        instance2: R1csInstance,
        witness2: R1csWitness,
    ):
        if len(instance1.x) != len(instance2.x):
            raise MalformedProof(
                f"instance x-length mismatch: {len(instance1.x)} vs "
                f"{len(instance2.x)} (proof.rs:44-52 shape checks)"
            )
        if len(witness1.w) != len(witness2.w):
            raise MalformedProof(
                f"witness length mismatch: {len(witness1.w)} vs {len(witness2.w)}"
            )
        driver = self.shape.driver
        transcript = _transcript(driver)
        t = self.compute_cross_term(instance1, witness1, instance2, witness2)
        commit_t = self.ck.commit(t)
        transcript.append_point(commit_t)
        instance1.absorb_by_transcript(transcript)
        r = transcript.squeeze(C.CHALLENGE_BITS).v
        instance = instance1.fold(instance2, r, commit_t)
        witness = witness1.fold(witness2, r, t, self.shape.p)
        return instance, witness, commit_t

    def compute_cross_term(self, instance1, witness1, instance2, witness2):
        """T = AZ1 o BZ2 + AZ2 o BZ1 - u1 CZ2 - u2 CZ1 (prover.rs:53-90)."""
        p = self.shape.p
        u1, u2 = instance1.u, 1
        z1 = [u1] + list(instance1.x) + list(witness1.w)
        z2 = [u2] + list(instance2.x) + list(witness2.w)
        l1 = len(instance1.x) + 1
        l2 = len(instance2.x) + 1
        sh = self.shape
        az1 = sh._prod(sh.a, z1, l1)
        bz1 = sh._prod(sh.b, z1, l1)
        cz1 = sh._prod(sh.c, z1, l1)
        az2 = sh._prod(sh.a, z2, l2)
        bz2 = sh._prod(sh.b, z2, l2)
        cz2 = sh._prod(sh.c, z2, l2)
        return [
            (a2 * b1 + a1 * b2 - u1 * c2 - u2 * c1) % p
            for a1, b1, c1, a2, b2, c2 in zip(az1, bz1, cz1, az2, bz2, cz2)
        ]


class NifsVerifier:
    @staticmethod
    def verify(commit_t, instance1: RelaxedR1csInstance, instance2: R1csInstance):
        """Recompute r from the transcript and fold instances (verifier.rs:12)."""
        driver = instance1.driver
        transcript = _transcript(driver)
        transcript.append_point(commit_t)
        instance1.absorb_by_transcript(transcript)
        r = transcript.squeeze(C.CHALLENGE_BITS).v
        return instance1.fold(instance2, r, commit_t)

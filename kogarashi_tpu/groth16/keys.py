"""Proving/verifying key material and proofs.

Parity: groth16/src/params.rs (Parameters), verifier.rs (VerifyingKey,
PreparedVerifyingKey), proof.rs (Proof). Query vectors are *device* batched
projective points (limb-major pytrees) so proving MSMs consume them directly;
the small verifying-key points are host pyref points. Verification uses the
prepared-coefficient Miller loop (one final exponentiation for 3 pairs,
proof.rs:31-46).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from ..errors import InconsistentPublicInputsLen
from ..pyref import AffinePoint, Fq12
from ..pyref.pairing_fast import (
    G2Prepared,
    final_exp_fast,
    multi_miller_loop,
)


@dataclass
class VerifyingKey:
    alpha_g1: AffinePoint
    beta_g1: AffinePoint
    beta_g2: AffinePoint
    gamma_g2: AffinePoint
    delta_g1: AffinePoint
    delta_g2: AffinePoint
    ic: list  # AffinePoints, len l

    def prepare(self) -> "PreparedVerifyingKey":
        return PreparedVerifyingKey(
            alpha_g1_beta_g2=final_exp_fast(
                multi_miller_loop(
                    [(self.alpha_g1, G2Prepared.from_affine(self.beta_g2))]
                )
            ),
            neg_gamma_g2=G2Prepared.from_affine(-self.gamma_g2),
            neg_delta_g2=G2Prepared.from_affine(-self.delta_g2),
            ic=list(self.ic),
        )


@dataclass
class PreparedVerifyingKey:
    alpha_g1_beta_g2: Fq12
    neg_gamma_g2: G2Prepared
    neg_delta_g2: G2Prepared
    ic: list


@dataclass
class Parameters:
    vk: VerifyingKey
    h: Any  # device G1 point batch, len n-1
    l: Any  # device G1 point batch, len m_l_1
    a: Any  # device G1 point batch, len l + m_l_1
    b_g1: Any
    b_g2: Any  # device G2 point batch
    l_pub: int  # number of public wires
    n: int  # FFT domain size
    mats: Any  # device COO dicts (A, B, C)
    num_wires: int


@dataclass
class Proof:
    a: AffinePoint
    b: AffinePoint  # G2
    c: AffinePoint

    def verify(self, pvk: PreparedVerifyingKey, public_inputs: list[int]):
        """Three-pair check (proof.rs:14-50):
        e(A,B) e(acc,-gamma) e(C,-delta) == e(alpha,beta)."""
        if len(public_inputs) + 1 != len(pvk.ic):
            # error.rs: InconsistentPublicInputsLen
            raise InconsistentPublicInputsLen(len(pvk.ic) - 1, len(public_inputs))
        acc = pvk.ic[0]
        for x, b in zip(public_inputs, pvk.ic[1:]):
            acc = acc + x * b
        lhs = multi_miller_loop(
            [
                (self.a, G2Prepared.from_affine(self.b)),
                (acc, pvk.neg_gamma_g2),
                (self.c, pvk.neg_delta_g2),
            ]
        )
        return final_exp_fast(lhs) == pvk.alpha_g1_beta_g2

"""Verifier (parity: groth16/src/verifier.rs:14)."""

from __future__ import annotations

from .keys import PreparedVerifyingKey, Proof


class Verifier:
    def __init__(self, vk: PreparedVerifyingKey):
        self.vk = vk

    def verify(self, proof: Proof, public_inputs: list[int]) -> bool:
        return proof.verify(self.vk, public_inputs)

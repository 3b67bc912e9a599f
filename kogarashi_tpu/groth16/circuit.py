"""Circuit interface (parity: groth16/src/circuit.rs:10 `Circuit` trait)."""

from __future__ import annotations

from abc import ABC, abstractmethod

from ..r1cs import R1CS, BN254_DRIVER


class Circuit(ABC):
    """Subclass with a `synthesize(cs)` writing constraints over Fr."""

    driver = BN254_DRIVER

    @abstractmethod
    def synthesize(self, cs: R1CS) -> None:
        ...

    def build(self) -> R1CS:
        cs = R1CS(self.driver)
        self.synthesize(cs)
        return cs

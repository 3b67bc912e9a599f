"""Groth16 zkSNARK over BN254 — TPU-native pipeline.

Parity: groth16/src/{zksnark,prover,verifier,proof,params}.rs. The heavy
phases (fixed-base query generation, Lagrange interpolation, QAP evaluation,
witness SpMV, the H-polynomial NTT pipeline, the 7 proof MSMs) run on device;
synthesis and the O(1) proof assembly/pairing checks stay host-side.
"""

from .circuit import Circuit
from .keys import Parameters, PreparedVerifyingKey, Proof, VerifyingKey
from .setup import setup
from .prover import Prover
from .verifier import Verifier

__all__ = [
    "Circuit",
    "Parameters",
    "PreparedVerifyingKey",
    "Proof",
    "VerifyingKey",
    "setup",
    "Prover",
    "Verifier",
]

"""Error taxonomy mirroring the reference's failure modes.

Parity: groth16/src/error.rs:1-8 (Error enum) plus the length/shape
validations nova/src/proof.rs:44-52 performs before verification. Python
exceptions replace the Result<_, Error> plumbing; each class corresponds to
one reference variant so callers can match on failure mode.
"""

from __future__ import annotations


class KogarashiError(Exception):
    """Base class for all protocol-level failures."""


class ProverSubVersionCrsAttack(KogarashiError):
    """CRS contains an identity delta/gamma — a subverted setup
    (error.rs: ProverSubVersionCrsAttack)."""


class ProverInversionFailed(KogarashiError):
    """A field inversion of zero inside proving
    (error.rs: ProverInversionFailed)."""


class ProofVerificationError(KogarashiError):
    """Pairing/hash equation mismatch (error.rs: ProofVerificationError)."""


class InconsistentPublicInputsLen(KogarashiError):
    """Public input vector length differs from the verifying key
    (error.rs: InconsistentPublicInputsLen)."""

    def __init__(self, expected: int, provided: int):
        super().__init__(f"expected {expected} public inputs, got {provided}")
        self.expected = expected
        self.provided = provided


class MalformedProof(KogarashiError):
    """Structural defect in a decoded proof: wrong x-vector lengths
    (nova/src/proof.rs:44-52), off-curve or out-of-subgroup points,
    non-canonical field bytes."""


class DecodeError(KogarashiError):
    """SCALE decoding failed: truncated input or invalid encoding."""

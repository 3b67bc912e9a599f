"""Pure-Python bigint oracle for the TPU framework.

Everything in here is slow, obvious, and branch-friendly Python used only as a
test oracle and for O(1) host-side glue — never on the hot path.
"""

from .field import Fq, Fr, PrimeField
from .tower import Fq2, Fq6, Fq12
from .curve import (
    AffinePoint,
    ProjectivePoint,
    CurveSpec,
    G1_SPEC,
    G2_SPEC,
    GRUMPKIN_SPEC,
)
from .pairing import pairing, miller_loop, final_exp, untwist
from .mimc import Mimc, MimcRO, mimc_constants

__all__ = [
    "Fq",
    "Fr",
    "PrimeField",
    "Fq2",
    "Fq6",
    "Fq12",
    "AffinePoint",
    "ProjectivePoint",
    "CurveSpec",
    "G1_SPEC",
    "G2_SPEC",
    "GRUMPKIN_SPEC",
    "pairing",
    "miller_loop",
    "final_exp",
    "untwist",
    "Mimc",
    "MimcRO",
    "mimc_constants",
]

"""Host-side R1CS constraint system.

Constraint synthesis is pointer-chasing sparse work — it stays on the host
(Python ints), mirroring the reference semantics (zkstd/src/r1cs.rs,
zkstd/src/matrix/). The numeric heavy phases (SpMV, NTT, MSM) consume the
exported COO arrays on device.
"""

from .system import R1CS, Wire, LinComb, ONE
from .driver import Driver, BN254_DRIVER, GRUMPKIN_DRIVER
from .gadgets.field import FieldAssignment
from .gadgets.binary import BinaryAssignment
from .gadgets.curve import PointAssignment

__all__ = [
    "R1CS",
    "Wire",
    "LinComb",
    "ONE",
    "Driver",
    "BN254_DRIVER",
    "GRUMPKIN_DRIVER",
    "FieldAssignment",
    "BinaryAssignment",
    "PointAssignment",
]

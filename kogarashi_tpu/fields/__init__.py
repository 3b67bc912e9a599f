from .spec import (
    FQ,
    FR,
    FieldSpec,
    N_LIMBS,
    LIMB_BITS,
    LIMB_MASK,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
)
from .mont import FQ_OPS, FR_OPS, Field

__all__ = [
    "FQ",
    "FR",
    "FieldSpec",
    "N_LIMBS",
    "LIMB_BITS",
    "LIMB_MASK",
    "int_to_limbs",
    "ints_to_limbs",
    "limbs_to_int",
    "limbs_to_ints",
    "FQ_OPS",
    "FR_OPS",
    "Field",
]

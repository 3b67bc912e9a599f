"""Field specifications and host-side limb packing for the TPU field layer.

Layout: a field element is 16 little-endian 16-bit limbs stored in a uint32
array of shape (..., 16) ("canonical" limbs are < 2^16). 16-bit limbs are the
TPU-native choice — the reference's 4x u64 + u128 carries
(zkstd/src/arithmetic/limbs/bits_256/normal.rs) have no hardware analogue on
TPU, while 16x16 -> 32-bit products are exact in uint32 VPU lanes and leave
headroom for lazy-carry accumulation.

Elements are kept in Montgomery form (x*R mod p, R = 2^256) with the same
radix as the reference so serialized bytes match bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import constants as C

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, n_limbs: int = N_LIMBS) -> np.ndarray:
    """One int -> (n_limbs,) uint32 canonical limbs (little-endian base 2^16)."""
    return np.frombuffer(
        int(v).to_bytes(2 * n_limbs, "little"), dtype=np.uint16
    ).astype(np.uint32)


def ints_to_limbs(vals, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Sequence of ints -> (n, n_limbs) uint32 limbs."""
    buf = b"".join(int(v).to_bytes(2 * n_limbs, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint16).reshape(-1, n_limbs).astype(np.uint32)


def limbs_to_int(arr) -> int:
    """(16,) limbs -> int."""
    a = np.asarray(arr, dtype=np.uint64)
    return sum(int(a[i]) << (LIMB_BITS * i) for i in range(a.shape[-1]))


def limbs_to_ints(arr) -> list[int]:
    """(n, 16) limbs -> list of ints."""
    a = np.asarray(arr)
    return [limbs_to_int(a[i]) for i in range(a.shape[0])]


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants (plain ints + numpy consts)."""

    name: str
    p: int
    inv: int  # -p^-1 mod 2^16
    r1: int  # R   mod p  (Montgomery one)
    r2: int  # R^2 mod p
    r3: int  # R^3 mod p
    generator: int
    s: int
    t: int
    root_of_unity: int
    n_limbs: int = N_LIMBS  # 16 for 256-bit widths, 24 for 384-bit (bits_384)
    p_limbs: np.ndarray = field(compare=False, default=None)
    r1_limbs: np.ndarray = field(compare=False, default=None)
    r2_limbs: np.ndarray = field(compare=False, default=None)
    r3_limbs: np.ndarray = field(compare=False, default=None)

    def __post_init__(self):
        object.__setattr__(self, "p_limbs", int_to_limbs(self.p, self.n_limbs))
        object.__setattr__(self, "r1_limbs", int_to_limbs(self.r1, self.n_limbs))
        object.__setattr__(self, "r2_limbs", int_to_limbs(self.r2, self.n_limbs))
        object.__setattr__(self, "r3_limbs", int_to_limbs(self.r3, self.n_limbs))

    @property
    def mont_r(self) -> int:
        """Montgomery radix R = 2^(16 * n_limbs)."""
        return 1 << (LIMB_BITS * self.n_limbs)

    # -- host-side encode/decode (Montgomery domain) -----------------------
    def encode(self, vals) -> np.ndarray:
        """Ints (standard form) -> (n, n_limbs) Montgomery limbs, host-side."""
        p, r = self.p, self.mont_r
        return ints_to_limbs([(int(v) % p) * r % p for v in vals], self.n_limbs)

    def encode1(self, v: int) -> np.ndarray:
        return self.encode([v])[0]

    def decode(self, arr) -> list[int]:
        """(n, n_limbs) Montgomery limbs -> list of standard-form ints."""
        rinv = pow(self.mont_r, -1, self.p)
        return [v * rinv % self.p for v in limbs_to_ints(arr)]

    def decode1(self, arr) -> int:
        return self.decode(np.asarray(arr).reshape(1, self.n_limbs))[0]


def _mk(name, p, generator, s, t, root, n_limbs=N_LIMBS):
    r1, r2, r3, _, inv16 = C.mont_consts(p, LIMB_BITS * n_limbs)
    return FieldSpec(
        name=name, p=p, inv=inv16, r1=r1, r2=r2, r3=r3,
        generator=generator, s=s, t=t, root_of_unity=root, n_limbs=n_limbs,
    )


FR = _mk("Fr", C.R, C.FR_GENERATOR, C.FR_S, C.FR_T, C.FR_ROOT_OF_UNITY)
FQ = _mk("Fq", C.Q, C.FQ_GENERATOR, C.FQ_S, C.FQ_T, C.FQ_ROOT_OF_UNITY)
# BLS12-381 scalar field = Jubjub base field (255-bit, fits the 16x16 layout;
# same 2^256 Montgomery radix as the reference's 4xu64 — zkstd/tests/jubjub.rs)
BLS_FR = _mk("BlsFr", C.BLS_FR, C.BLS_FR_GENERATOR, C.BLS_FR_S, C.BLS_FR_T, C.BLS_FR_ROOT_OF_UNITY)
# BLS12-381 base field — the 384-bit (24-limb) width, mirroring the
# reference's bits_384 limb layer (zkstd/src/arithmetic/limbs/bits_384).
# q = 3 mod 4: S = 1, multiplicative generator 2, root of unity = -1.
_BLS_FQ_S, _BLS_FQ_T = C.two_adicity(C.BLS_FQ)
BLS_FQ = _mk(
    "BlsFq", C.BLS_FQ, 2, _BLS_FQ_S, _BLS_FQ_T, C.BLS_FQ - 1, n_limbs=24
)

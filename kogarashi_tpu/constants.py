"""BN254 / Grumpkin curve-cycle constants.

All values are plain Python ints, derived from first principles at import time
where possible (Montgomery radix values, 2-adic roots of unity, inversion
constants) so nothing can silently drift from the moduli.

Parity notes (reference = KogarashiNetwork/Kogarashi, Rust):
  - Fr modulus / R / R2 / R3 / INV: bn254/src/fr.rs:11-51
  - Fq modulus: bn254/src/fq.rs:9-44
  - Fr multiplicative generator 7, S=28: bn254/src/fr.rs:18,53
  - Fq multiplicative generator 3: bn254/src/fq.rs:17
  - BN_X: bn254/src/params.rs:4
  - G1 generator (1,2), b=3: bn254/src/params.rs:8-12
  - G2 generator + twist b: bn254/src/params.rs:15-57
  - Grumpkin: y^2 = x^3 - 17 over Fr, generator (1, -sqrt(-16)):
    grumpkin/src/params.rs:1-19
"""

# ---------------------------------------------------------------------------
# Prime moduli
# ---------------------------------------------------------------------------

# Base field of BN254 G1 (== scalar field of Grumpkin)
Q = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
# Scalar field of BN254 (== base field of Grumpkin)
R = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001

assert Q.bit_length() == 254 and R.bit_length() == 254

# BN parameter x: p = 36x^4 + 36x^3 + 24x^2 + 6x + 1, r = 36x^4 + 36x^3 + 18x^2 + 6x + 1
BN_X = 4965661367192848881
assert Q == 36 * BN_X**4 + 36 * BN_X**3 + 24 * BN_X**2 + 6 * BN_X + 1
assert R == 36 * BN_X**4 + 36 * BN_X**3 + 18 * BN_X**2 + 6 * BN_X + 1

# Miller-loop length 6x+2 (optimal ate), see bn254/src/pairing.rs:5-9
SIX_X_PLUS_2 = 6 * BN_X + 2

# ---------------------------------------------------------------------------
# Montgomery-domain helpers (256-bit radix, to match reference serialization)
# ---------------------------------------------------------------------------

MONT_BITS = 256
MONT_R = 1 << MONT_BITS


def mont_consts(p: int, bits: int = MONT_BITS):
    """(R mod p, R^2 mod p, R^3 mod p, -p^-1 mod 2^64, -p^-1 mod 2^16).

    `bits` is the Montgomery radix width: 256 for 16-limb fields, 384 for
    24-limb (the reference's bits_256 / bits_384 split).
    """
    r1 = (1 << bits) % p
    r2 = (r1 * r1) % p
    r3 = (r2 * r1) % p
    inv64 = (-pow(p, -1, 1 << 64)) % (1 << 64)
    inv16 = (-pow(p, -1, 1 << 16)) % (1 << 16)
    return r1, r2, r3, inv64, inv16


FR_R1, FR_R2, FR_R3, FR_INV64, FR_INV16 = mont_consts(R)
FQ_R1, FQ_R2, FQ_R3, FQ_INV64, FQ_INV16 = mont_consts(Q)

# Spot-check vs reference-published hex (bn254/src/fr.rs:24-51)
assert FR_R1 == 0x0E0A77C19A07DF2F666EA36F7879462E36FC76959F60CD29AC96341C4FFFFFFB
assert FR_R2 == 0x0216D0B17F4E44A58C49833D53BB808553FE3AB1E35C59E31BB8E645AE216DA7
assert FR_INV64 == 0xC2E1F593EFFFFFFF

# ---------------------------------------------------------------------------
# 2-adicity / FFT constants
# ---------------------------------------------------------------------------


def two_adicity(p: int):
    s = 0
    t = p - 1
    while t % 2 == 0:
        t //= 2
        s += 1
    return s, t


FR_S, FR_T = two_adicity(R)  # S = 28
FQ_S, FQ_T = two_adicity(Q)  # S = 1
assert FR_S == 28

FR_GENERATOR = 7  # bn254/src/fr.rs:18
FQ_GENERATOR = 3  # bn254/src/fq.rs:17

# 2^S-th root of unity: g^t (bn254/src/fr.rs:56-65)
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, FR_T, R)
assert FR_ROOT_OF_UNITY == 0x03DDB9F5166D18B798865EA93DD31F743215CF6DD39329C8D34F1ED960C37C9C
FQ_ROOT_OF_UNITY = pow(FQ_GENERATOR, FQ_T, Q)

# ---------------------------------------------------------------------------
# G1: y^2 = x^3 + 3 over Fq
# ---------------------------------------------------------------------------

G1_B = 3
G1_GEN = (1, 2)
assert (G1_GEN[1] ** 2 - G1_GEN[0] ** 3 - G1_B) % Q == 0

# ---------------------------------------------------------------------------
# Grumpkin: y^2 = x^3 - 17 over Fr (scalar field = Fq) — the 2-cycle partner
# ---------------------------------------------------------------------------

GRUMPKIN_B = (-17) % R
# Generator (1, y) with y^2 = 1 - 17 = -16; the reference picks the odd root
# (grumpkin/src/params.rs:5-10): y = 0x2CF135E7506A45D632D270D45F1181294833FC48D823F272C
# ... derived below and asserted against the decoded reference constant.
_y2 = (-16) % R
_y = pow(_y2, (R + 1) // 4, R) if R % 4 == 3 else None
if _y is None or (_y * _y) % R != _y2:
    # R % 4 == 1, use Tonelli-Shanks
    def _tonelli(n, p, g, s, t):
        if pow(n, (p - 1) // 2, p) != 1:
            raise ValueError("not a QR")
        z = pow(g, t, p)  # generator of 2-Sylow
        m, c, tt, rr = s, z, pow(n, t, p), pow(n, (t + 1) // 2, p)
        while tt != 1:
            i, tmp = 0, tt
            while tmp != 1:
                tmp = tmp * tmp % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            tt, rr = tt * c % p, rr * b % p
        return rr

    _y = _tonelli(_y2, R, FR_GENERATOR, FR_S, FR_T)
# Reference picks this particular root (decoded from grumpkin/src/params.rs:6-10
# Montgomery limbs [0x11b2dff1448c41d8,0x23d3446f21c77dc3,0xaa7b8cf435dfafbb,0x14b34cf69dc25d68]).
_REF_GRUMPKIN_GEN_Y = (
    0x14B34CF69DC25D68AA7B8CF435DFAFBB23D3446F21C77DC311B2DFF1448C41D8 * pow(MONT_R, -1, R)
) % R
GRUMPKIN_GEN = (1, _REF_GRUMPKIN_GEN_Y)
assert _REF_GRUMPKIN_GEN_Y in (_y, R - _y)
assert (GRUMPKIN_GEN[1] ** 2 - GRUMPKIN_GEN[0] ** 3 - GRUMPKIN_B) % R == 0

# ---------------------------------------------------------------------------
# G2: y^2 = x^3 + 3/(9+u) over Fq2 = Fq[u]/(u^2+1)  (D-type twist)
# Coordinates as (c0, c1) pairs meaning c0 + c1*u.
# Standard BN254 G2 generator (bn254/src/params.rs:15-42).
# ---------------------------------------------------------------------------

G2_GEN_X = (
    0x1800DEEF121F1E76426A00665E5C44794A4B7ACF148D4A4BBE49BFB10FE99E6E
    % Q,  # placeholder replaced below
    0,
)
# The canonical generator (same as EIP-197 / halo2curves):
G2_GEN_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GEN_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# b' = 3 / (9 + u) over Fq2
_xi = (9, 1)  # xi = 9 + u, the sextic non-residue


def _fq2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)


def _fq2_inv(a):
    n = pow(a[0] * a[0] + a[1] * a[1], -1, Q)
    return (a[0] * n % Q, -a[1] * n % Q)


G2_B = _fq2_mul((3, 0), _fq2_inv(_xi))
# check generator satisfies the twist equation
_lhs = _fq2_mul(G2_GEN_Y, G2_GEN_Y)
_rhs = _fq2_mul(_fq2_mul(G2_GEN_X, G2_GEN_X), G2_GEN_X)
assert _lhs == ((_rhs[0] + G2_B[0]) % Q, (_rhs[1] + G2_B[1]) % Q)

FQ2_XI = _xi

# ---------------------------------------------------------------------------
# MiMC (nova/src/hash.rs:7-13)
# ---------------------------------------------------------------------------

MIMC_ROUNDS = 46
CHALLENGE_BITS = 128
HASH_BITS = 252

# Nova BigNat gadget limb layout (nova/src/gadget/big_nat.rs:8-9)
BN_LIMB_WIDTH = 64
BN_N_LIMBS = 4

# ---------------------------------------------------------------------------
# Jubjub over the BLS12-381 scalar field (zkstd/tests/jubjub.rs fixture):
# twisted Edwards  -x^2 + y^2 = 1 + d x^2 y^2  (a = -1),
# d = -(10240/10241).  The zkstd Edwards layer (arithmetic/points/edwards.rs,
# traits/curve/edwards.rs, traits/sign.rs) is generic; Jubjub is its canonical
# instantiation and the base curve for the RedDSA signature scheme.
# ---------------------------------------------------------------------------

# BLS12-381 scalar field (jubjub base field), 255 bits
BLS_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS_FR_GENERATOR = 7  # multiplicative generator (jubjub.rs BLS_SCALAR_GENERATOR = 7*R)
BLS_FR_S, BLS_FR_T = two_adicity(BLS_FR)
assert BLS_FR_S == 32  # zkstd/tests/jubjub.rs: S = 32
BLS_FR_ROOT_OF_UNITY = pow(BLS_FR_GENERATOR, BLS_FR_T, BLS_FR)

# Jubjub prime-order subgroup order (= scalar field; zkstd/tests/jubjub.rs
# JUBJUB_MODULUS), cofactor 8
JUBJUB_ORDER = 0x0E7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7
JUBJUB_COFACTOR = 8

# d = -(10240/10241) mod BLS_FR (jubjub.rs EDWARDS_D raw limbs)
JUBJUB_D = (-10240 * pow(10241, -1, BLS_FR)) % BLS_FR
assert JUBJUB_D == 0x2A9318E74BFA2B48F5FD9207E6BD7FD4292D7F6D37579D2601065FD6D6343EB1

# Generator of the prime-order subgroup (jubjub.rs X/Y raw limbs)
JUBJUB_GEN = (
    0x3FD2814C43AC65A6F1FBF02D0FD6CCE62E3EBB21FD6C54ED4DF7B7FFEC7BEACA,
    0x12,
)
# on-curve: -x^2 + y^2 = 1 + d x^2 y^2
_jx, _jy = JUBJUB_GEN
assert (-_jx * _jx + _jy * _jy - 1 - JUBJUB_D * _jx * _jx % BLS_FR * _jy * _jy) % BLS_FR == 0

# ---------------------------------------------------------------------------
# BLS12-381 base field (384-bit width; zkstd/src/arithmetic/limbs/bits_384 and
# the bls12_381_field fixture in zkstd/tests/jubjub.rs) — exercises the
# wide-limb field path
# ---------------------------------------------------------------------------

BLS_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
assert BLS_FQ.bit_length() == 381

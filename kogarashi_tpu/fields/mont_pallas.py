"""Straight-line Montgomery limb arithmetic for Pallas TPU kernels (13-bit limbs).

This is the hand-optimised limb engine behind the MSM/EC kernels — the TPU
analogue of the reference's x86_64 asm module
(zkstd/src/arithmetic/limbs/bits_256/assembly.rs) and CIOS `mont`
(zkstd/src/arithmetic/limbs/bits_256/normal.rs:83-269). Target ISA here is
the TPU VPU: everything is (sub, 128)-shaped int32/uint32 vector ops that
Mosaic keeps in registers/VMEM.

Why 13-bit limbs (20 limbs per 256-bit element, radix R' = 2^260):
measured on-chip, u32 multiply runs at full VPU rate, and the cost of a
Montgomery multiply is dominated by per-product *glue*. With 16-bit limbs
every 32-bit product must be split into (lo, hi) halves before accumulation
(2 extra ops per product). With 13-bit limbs, products are < 2^26 and a full
CIOS pass accumulates at most ~40 of them per column: the column sums stay
< 2^31.5 < 2^32, so products accumulate *unsplit* in uint32 columns and a
single carry ripple at the end restores strict limbs. That cuts a Montgomery
multiply from ~2600 to ~1700 lane-ops.

Bound discipline (exact, no approximate reductions):

  * Limbs are always STRICT: in [0, 2^13). Values are bounded statically,
    tracked per call site as small multiples of p.
  * `mm(a, b)` accepts values < 8p and returns < 1.76p:
      out < A*B/R' + p < 64 p^2 / 2^260 + p < (0.76 + 1) p   (BN254 p, q)
    (needs 8p < 2^257 <= value capacity 2^260: true for 254-bit moduli).
  * `modadd` is an exact sum (no reduction): bound = sum of input bounds.
  * `modsub(a, b, k)` computes a + (k*p - b) for a static even k chosen per
    call site so k*p >= b's bound: exact, never negative, never wraps.
  * Every formula in ops/ec_pallas.py carries a static bound proof that all
    `mm` inputs stay < 8p. There is NO approximate top-limb reduction --
    the previous engine's 2p+eps slop made `neg`'s 2p - a go negative for
    a in (2p, 2p+eps] and wrap, which is exactly the class of data-dependent
    on-chip corruption this rewrite eliminates.

Montgomery radix: R' = 2^260 (not the 2^256 used by the 16-bit XLA layer in
fields/mont.py). Conversions happen only at host boundaries: points are
encoded directly into x*R' mod p limbs (ops/msm_pallas.py:prepare_points),
and the single final point is decoded with R'^-1. Scalars stay in standard
form and never enter this representation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .spec import FieldSpec

W = 13  # limb width in bits
WMASK = (1 << W) - 1
I32 = jnp.int32
U32 = jnp.uint32


def limbs13(v: int, n: int) -> tuple:
    """Int -> n-tuple of 13-bit limbs (little-endian base 2^13)."""
    return tuple((v >> (W * i)) & WMASK for i in range(n))


def limbs13_to_int(limbs) -> int:
    return sum(int(l) << (W * i) for i, l in enumerate(limbs))


def _rows(vals: tuple, tile: tuple, dtype=I32) -> jnp.ndarray:
    """Int tuple -> (n, *tile) array built from scalar literals (Mosaic-safe
    scalar -> tile fills; no array-constant capture)."""
    return jnp.stack([jnp.full(tile, int(v), dtype) for v in vals])


@dataclass(frozen=True)
class MontConsts:
    """Static per-field constants for the 13-bit engine (plain ints)."""

    n: int  # limb count (20 for 256-bit fields)
    p: int
    p_t: tuple  # strict 13-bit limbs of p
    inv: int  # -p^-1 mod 2^13
    one_t: tuple  # R' mod p (Montgomery one)
    r_bits: int  # 260: log2 of the Montgomery radix R'

    @staticmethod
    def make(spec: FieldSpec) -> "MontConsts":
        assert spec.n_limbs == 16, "13-bit pallas engine covers 256-bit fields"
        n = 20
        p = spec.p
        assert 8 * p < (1 << (W * n - 3)), "need 8p << 2^260 for bound proofs"
        return MontConsts(
            n=n,
            p=p,
            p_t=limbs13(p, n),
            inv=int((-pow(p, -1, 1 << W)) % (1 << W)),
            one_t=limbs13((1 << (W * n)) % p, n),
            r_bits=W * n,
        )

    def kp_t(self, k: int) -> tuple:
        """Strict limbs of k*p (k small static int)."""
        return limbs13(k * self.p, self.n)

    def const_tuple(self, v: int) -> tuple:
        """Standard-form int -> Montgomery(R') strict limb tuple."""
        return limbs13((v % self.p) * (1 << self.r_bits) % self.p, self.n)

    @property
    def mont_r(self) -> int:
        return 1 << self.r_bits


def zero(K: MontConsts, tile) -> jnp.ndarray:
    return jnp.zeros((K.n, *tile), I32)


def one(K: MontConsts, tile) -> jnp.ndarray:
    return _rows(K.one_t, tuple(tile))


def ripple_u(v):
    """Unsigned carry propagation -> strict limbs. v: uint32 rows (value
    < 2^260); returns int32 strict rows."""
    rows = []
    c = jnp.zeros(v.shape[1:], U32)
    for k in range(v.shape[0]):
        t = v[k] + c
        rows.append((t & U32(WMASK)).astype(I32))
        c = t >> W
    return jnp.stack(rows)


def ripple_s(v):
    """Signed carry propagation -> strict limbs. v: int32 rows, possibly
    negative per-limb but nonnegative in value; arithmetic shifts."""
    rows = []
    c = jnp.zeros(v.shape[1:], I32)
    for k in range(v.shape[0]):
        t = v[k] + c
        rows.append(t & I32(WMASK))
        c = t >> W
    return jnp.stack(rows)


def modadd(a, b):
    """Exact a + b (strict limbs out). Bound: A + B (caller tracks)."""
    return ripple_s(a + b)


def modadd3(a, b, c):
    return ripple_s(a + b + c)


def modsub(a, b, K: MontConsts, k: int):
    """a - b + k*p, exact. Caller guarantees k*p >= bound(b); bound out =
    A + k."""
    kp = _rows(K.kp_t(k), b.shape[1:])
    return ripple_s(a + (kp - b))


def modsub2(a, b, c, K: MontConsts, kb: int, kc: int):
    """a - b - c + (kb+kc)*p, exact."""
    kbp = _rows(K.kp_t(kb), b.shape[1:])
    kcp = _rows(K.kp_t(kc), c.shape[1:])
    return ripple_s(a + (kbp - b) + (kcp - c))


def neg(a, K: MontConsts, k: int):
    """k*p - a (== -a mod p), exact; requires bound(a) <= k."""
    return ripple_s(_rows(K.kp_t(k), a.shape[1:]) - a)


def mm(a, b, K: MontConsts):
    """CIOS Montgomery product a*b*R'^-1 mod p, fully unrolled.

    Inputs: strict 13-bit limbs, values < 8p. Output: strict limbs, < 1.76p.
    Column bound: each uint32 column accumulates <= ~40 products < 2^26 plus
    two carry pushes < 2^19 => < 2^31.5 < 2^32 (no splitting, no overflow).
    """
    n = K.n
    au = a.astype(U32)
    bu = b.astype(U32)
    cols: list = [None] * (2 * n)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        ai = au[i]
        for j in range(n):
            acc(i + j, ai * bu[j])
    inv = U32(K.inv)
    for k in range(n):
        m = (cols[k] * inv) & U32(WMASK)
        for j in range(n):
            acc(k + j, m * U32(K.p_t[j]))
        # column k is now 0 mod 2^13; push its carry into column k+1
        acc(k + 1, cols[k] >> W)
    return ripple_u(_stack_cols(cols[n : 2 * n], a.shape[1:]))


def _stack_cols(cols, tile):
    """Stack columns, materialising never-touched ones (e.g. the top column,
    which only the ripple carry reaches) as zeros."""
    z = None
    out = []
    for c in cols:
        if c is None:
            if z is None:
                z = jnp.zeros(tile, U32)
            c = z
        out.append(c)
    return jnp.stack(out)


def sqr(a, K: MontConsts):
    """Montgomery square: shares cross products (saves ~45% of the product
    phase). Same bounds as mm. Column check: doubled cross products < 2^27,
    <= 10 per column + diagonal + reduction terms => < 2^31.6 < 2^32."""
    n = K.n
    au = a.astype(U32)
    cols: list = [None] * (2 * n)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        ai = au[i]
        acc(2 * i, ai * ai)
        for j in range(i + 1, n):
            prod2 = (ai * au[j]) << 1  # < 2^27
            acc(i + j, prod2)
    inv = U32(K.inv)
    for k in range(n):
        m = (cols[k] * inv) & U32(WMASK)
        for j in range(n):
            acc(k + j, m * U32(K.p_t[j]))
        acc(k + 1, cols[k] >> W)
    return ripple_u(_stack_cols(cols[n : 2 * n], a.shape[1:]))


def cond_sub(a, K: MontConsts, k: int):
    """Exact conditional subtract: a - k*p if a >= k*p else a (strict limbs).
    One extra borrow ripple + select."""
    kp = _rows(K.kp_t(k), a.shape[1:])
    d = a - kp
    rows, c = [], jnp.zeros(a.shape[1:], I32)
    for i in range(K.n):
        t = d[i] + c
        rows.append(t & I32(WMASK))
        c = t >> W
    return jnp.where(c == 0, jnp.stack(rows), a)


def canonical(a, K: MontConsts, bound: int):
    """Value < bound*p (strict limbs) -> canonical [0, p): repeated exact
    conditional subtraction. Cheap; for kernel epilogues / tiny batches."""
    k = 1
    while k < bound:
        k *= 2
    while k >= 1:
        kp = _rows(K.kp_t(k), a.shape[1:])
        d = a - kp
        # exact borrow chain
        rows, c = [], jnp.zeros(a.shape[1:], I32)
        for i in range(K.n):
            t = d[i] + c
            rows.append(t & I32(WMASK))
            c = t >> W
        ge = c == 0  # no final borrow -> a >= k*p
        sub = jnp.stack(rows)
        a = jnp.where(ge, sub, a)
        k //= 2
    return a

"""Fully-unrolled Montgomery limb arithmetic for Pallas TPU kernels.

This is the speed-of-light layer the round-1 verdict asked for: the rolled
`lax.scan` CIOS in fields/mont.py round-trips its carry state through HBM on
every iteration, which makes a 2^20 MSM take ~21 s. Here every multiply is a
straight-line sequence of (sub, 128)-shaped int32 vector ops that Mosaic keeps
entirely in registers/VMEM, so an EC point add costs ~35k VPU lane-ops instead
of dozens of HBM round trips.

Element representation (inside a kernel): one int32 array of shape
(n_limbs, *tile), limb-major, tile = (sub, 128) lanes of independent field
elements. Limbs are STRICT: in [0, 2^16). Values are bounded by 2p + eps
(eps ~ 2^245 from the approximate top-limb reduction); this satisfies the
Walter bound (4p < 2^256), so CIOS Montgomery outputs stay < 2p with NO
conditional subtraction:

    mont(A, B) <= A*B/2^256 + p <= (2p+eps)^2/2^256 + p < 1.77p   (BN254/BN254-Fr)

All multiplies are 32-bit with both operands < 2^16, so the product never
wraps; (prod & 0xffff) and (prod >> 16) extract the exact halves. Additions/
subtractions run in i32 with signed carries and a final sequential ripple back
to strict limbs.

All per-field constants are embedded as scalar literals (Pallas kernels cannot
capture array constants), broadcast in-kernel by `_rows`.

Parity: replaces zkstd/src/arithmetic/limbs/bits_256/normal.rs (CIOS `mont`,
`add`, `sub`, lines 4-287) and the x86_64 asm module (assembly.rs) as the
"hand-optimised native limb engine" — here the target ISA is the TPU VPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .spec import FieldSpec

MASK = 0xFFFF
I32 = jnp.int32
U32 = jnp.uint32


def _limb_tuple(v: int, n: int) -> tuple:
    return tuple((v >> (16 * i)) & MASK for i in range(n))


def _rows(vals: tuple, tile: tuple, dtype=I32) -> jnp.ndarray:
    """Int tuple -> (n, *tile) array built from scalar literals.

    Full-shape scalar broadcasts only: Mosaic cannot broadcast a (1, 1)
    array into both sublanes and lanes, but scalar -> tile fills are fine."""
    return jnp.stack([jnp.full(tile, int(v), dtype) for v in vals])


@dataclass(frozen=True)
class MontConsts:
    """Static per-field constants (plain ints: safe to embed in any kernel)."""

    n: int  # limb count (16 for 256-bit fields)
    p_t: tuple  # strict limbs of p
    two_p_t: tuple  # strict limbs of 2p
    four_p_t: tuple  # strict limbs of 4p   (4p < 2^256 holds)
    inv: int  # -p^-1 mod 2^16
    t1: int  # floor(2p / 2^(16*(n-1))): top-limb threshold for "value >= 2p"
    t2: int  # floor(4p / 2^(16*(n-1)))
    one_t: tuple  # R mod p (Montgomery 1)
    p: int

    @staticmethod
    def make(spec: FieldSpec) -> "MontConsts":
        n, p = spec.n_limbs, spec.p
        shift = 16 * (n - 1)
        return MontConsts(
            n=n,
            p_t=_limb_tuple(p, n),
            two_p_t=_limb_tuple(2 * p, n),
            four_p_t=_limb_tuple(4 * p, n),
            inv=int((-pow(p, -1, 1 << 16)) % (1 << 16)),
            t1=(2 * p) >> shift,
            t2=(4 * p) >> shift,
            one_t=_limb_tuple(spec.mont_r % p, n),
            p=p,
        )

    def const_tuple(self, v: int) -> tuple:
        """Standard-form int -> Montgomery-form strict limb tuple."""
        return _limb_tuple((v % self.p) * (1 << (16 * self.n)) % self.p, self.n)


def zero(K: MontConsts, tile) -> jnp.ndarray:
    return jnp.zeros((K.n, *tile), I32)


def one(K: MontConsts, tile) -> jnp.ndarray:
    return _rows(K.one_t, tuple(tile))


def ripple(v):
    """Sequential carry propagation -> strict limbs in [0, 2^16).

    Exact for any int32 rows as long as the represented value is in
    [0, 2^(16n)) — signed carries (arithmetic >>) handle negative rows.
    """
    rows = []
    c = jnp.zeros(v.shape[1:], I32)
    for k in range(v.shape[0]):
        t = v[k] + c
        rows.append(t & MASK)
        c = t >> 16
    return jnp.stack(rows)


def approx_reduce(v, K: MontConsts, bound_p: int):
    """Subtract 2p/4p based on the top limb so the value drops below 2p + eps.

    `v`: i32 rows, possibly lazy: rows in (-2^17, 2^18), so the top limb
    estimates the value with < 2^242 absolute slop. `bound_p`: static upper
    bound on v as a multiple of p. With margin 8, `top >= t+8` guarantees
    value >= (t+4)*2^240 > subtrahend (no underflow), and the not-reduced
    residual stays < 2p + 2^245 =: 2p + eps (eps accumulated over the <= ~16
    chained ops inside one point formula stays << p/256 — every Montgomery
    multiply resets its output bound to < 1.77p strictly).
    """
    if bound_p <= 2:
        return v
    tile = v.shape[1:]
    top = v[K.n - 1]
    if bound_p > 4:
        assert bound_p <= 6, "chain too long for two-level reduction"
        sel4 = (top >= K.t2 + 8).astype(I32)
        sel2 = jnp.logical_and(top >= K.t1 + 8, top < K.t2 + 8).astype(I32)
        sub = sel4[None] * _rows(K.four_p_t, tile) + sel2[None] * _rows(K.two_p_t, tile)
    else:
        sel2 = (top >= K.t1 + 8).astype(I32)
        sub = sel2[None] * _rows(K.two_p_t, tile)
    return v - sub


def modadd(a, b, K: MontConsts, bound_p: int = 4):
    """a + b with strict-limb output; value bound ~2p+eps (inputs <= 2p+eps)."""
    return ripple(approx_reduce(a + b, K, bound_p))


def modadd3(a, b, c, K: MontConsts):
    """a + b + c (inputs <= 2p+eps each) -> strict, <= 2p+eps."""
    return ripple(approx_reduce(a + b + c, K, 6))


def modsub(a, b, K: MontConsts):
    """a - b via a + (2p - b); inputs <= 2p+eps -> strict, <= 2p+eps."""
    return ripple(approx_reduce(a + (_rows(K.two_p_t, b.shape[1:]) - b), K, 4))


def modsub2(a, b, c, K: MontConsts):
    """a - b - c via a + (2p-b) + (2p-c) -> strict, <= 2p+eps."""
    two_p = _rows(K.two_p_t, b.shape[1:])
    return ripple(approx_reduce(a + (two_p - b) + (two_p - c), K, 6))


def triple(a, K: MontConsts):
    """3a -> strict, <= 2p+eps."""
    return ripple(approx_reduce(a + a + a, K, 6))


def neg(a, K: MontConsts):
    """2p - a (== -a mod p); strict in [0, 2p]."""
    return ripple(_rows(K.two_p_t, a.shape[1:]) - a)


def mm(a, b, K: MontConsts):
    """CIOS Montgomery product a*b*R^-1 mod p, fully unrolled.

    Inputs: strict limbs, values <= 2p+eps. Output: strict limbs, value
    < 1.77p (Walter bound, no conditional subtract). ~16 32-bit multiplies
    per output limb; all straight-line (sub, 128) vector ops.
    """
    n = K.n
    tile = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    # run the product/column phase in uint32: logical >> 16 extracts the hi
    # half with no sign-fix mask, and all column sums are nonnegative.
    # Columns are a Python list of (tile,) arrays — Mosaic has no scatter, so
    # sliced-array updates are expressed as per-column adds (same op count).
    au = a.astype(U32)
    bu = jnp.broadcast_to(b.astype(U32), (n, *tile))
    cols: list = [None] * (2 * n + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    # schoolbook product, lazily split into 16-bit column sums (< 2^22 << 2^32)
    for i in range(n):
        prod = au[i][None] * bu  # (n, *tile); u32 wrap == exact low 32 bits
        lo = prod & MASK
        hi = prod >> 16
        for j in range(n):
            acc(i + j, lo[j])
            acc(i + j + 1, hi[j])
    # interleaved Montgomery reduction: zero columns 0..n-1
    inv = U32(K.inv)
    for k in range(n):
        m = (cols[k] * inv) & MASK
        for j in range(n):
            prod = m * U32(K.p_t[j])
            acc(k + j, prod & MASK)
            acc(k + j + 1, prod >> 16)
        # column k is now == 0 mod 2^16; push its carry into column k+1
        acc(k + 1, cols[k] >> 16)
    return ripple(jnp.stack([c.astype(I32) for c in cols[n : 2 * n]]))


def sqr(a, K: MontConsts):
    return mm(a, a, K)

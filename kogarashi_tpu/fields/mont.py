"""Vectorized Montgomery arithmetic over 16x16-bit limbs (JAX, TPU-first).

Layout: **limb-major** — a batch of field elements is a uint32 array of shape
(16, *batch): limb index on axis 0 (sublanes), batch on the trailing axes
(lanes). This keeps the 128-wide VPU lanes full of independent elements and
lets limb-axis arithmetic be expressed as whole-array ops (one XLA op per
product row instead of one per limb), keeping traces small.

Elements are canonical (< 2^16 per limb) Montgomery-form values in [0, p).
All control flow is branchless — identity/overflow cases use selects so one
trace serves every lane.

Design notes (vs reference zkstd/src/arithmetic/limbs/bits_256/normal.rs):
  - The reference uses 4x u64 limbs with u128 carries; TPUs have no 64-bit
    multiplier, so we use 16-bit limbs in uint32 lanes: 16x16 -> 32-bit
    products are exact, and lazy carries accumulate in the upper 16 bits
    (bounded by ~2^23 across a full CIOS pass — far from overflow).
  - CIOS Montgomery multiplication with inv = -p^-1 mod 2^16; a final
    conditional subtract keeps results canonical (mirrors `mont`'s
    subtract-p epilogue, normal.rs:187).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spec import FieldSpec, LIMB_MASK, N_LIMBS

import os

# Unroll factor for the inner CIOS/carry scans. Rolled loops (1) keep XLA
# traces small (fast CPU compiles for tests); full unroll (16) lets XLA fuse
# each Montgomery multiply into one kernel — crucial on TPU, where rolled
# scan iterations round-trip the carry state through HBM every ~12 ops.
UNROLL = int(os.environ.get("KOGARASHI_MONT_UNROLL", "1"))

U32 = jnp.uint32
I32 = jnp.int32
MASK = np.uint32(LIMB_MASK)


def _consts_col(limbs: np.ndarray, batch_ndim: int):
    """Host (L,) limb consts -> (L, 1, 1, ...) broadcastable device array."""
    return jnp.asarray(limbs, U32).reshape((len(limbs),) + (1,) * batch_ndim)


def _carry_canonical(t):
    """Exact carry propagation: relaxed uint32 limbs -> (canonical, top carry).

    t: (L, *batch) with entries < 2^32. Returns ((L, *batch) canonical < 2^16,
    (*batch,) final carry). lax.scan keeps the trace at ~3 ops regardless of L.
    """

    def body(carry, row):
        v = row + carry
        return v >> 16, v & MASK

    carry, rows = jax.lax.scan(body, jnp.zeros(t.shape[1:], U32), t, unroll=UNROLL)
    return rows, carry


def _carry_signed(t):
    """Signed carry propagation for int32 rows in (-2^16, 2^17+eps).

    Returns ((L, *batch) canonical uint32 limbs, (*batch,) final int32 carry).
    """

    def body(carry, row):
        v = row + carry
        return v >> 16, (v & I32(LIMB_MASK)).astype(U32)

    carry, rows = jax.lax.scan(body, jnp.zeros(t.shape[1:], I32), t, unroll=UNROLL)
    return rows, carry


def _sub_p_if_ge(x, spec: FieldSpec, top=None):
    """Branchless canonical-limb (N, *batch) value (< 2p) minus p if >= p.

    `top` (optional, (*batch,)) is a 2^256-overflow limb; nonzero forces >= p.
    """
    p = _consts_col(spec.p_limbs, x.ndim - 1).astype(I32)
    rows, borrow = _carry_signed(x.astype(I32) - p)
    ge = borrow == 0
    if top is not None:
        ge = ge | (top != 0)
    return jnp.where(ge, rows, x)


def _finalize(t, spec: FieldSpec):
    """Fused carry-propagate + conditional-subtract-p for relaxed rows.

    t: (L, *batch) int32-safe relaxed rows (uint32 < 2^31 or int32 partials),
    L >= 16, representing a value in [0, 2p). One lax.scan runs both the
    canonicalizing carry chain and the (value - p) borrow chain, then selects.
    """
    L = t.shape[0]
    nl = spec.n_limbs
    p = np.zeros(L, np.int64)
    p[:nl] = spec.p_limbs
    p_rows = jnp.asarray(p, I32).reshape((L,) + (1,) * (t.ndim - 1))
    p_rows = jnp.broadcast_to(p_rows, t.shape)

    def body(carries, rows):
        c1, c2 = carries
        row, prow = rows
        v = row.astype(I32) + c1
        lim = v & I32(LIMB_MASK)
        d = lim - prow + c2
        return (v >> 16, d >> 16), (lim.astype(U32), (d & I32(LIMB_MASK)).astype(U32))

    z = jnp.zeros(t.shape[1:], I32)
    (c1, borrow), (lims, diffs) = jax.lax.scan(body, (z, z), (t, p_rows), unroll=UNROLL)
    # value < 2p < 2^(16*nl): rows beyond nl-1 end up zero; ge iff borrow clears
    ge = borrow == 0
    return jnp.where(ge, diffs, lims)[:nl]


# ---------------------------------------------------------------------------
# Public ops (shape-polymorphic over trailing batch axes)
# ---------------------------------------------------------------------------


def add(a, b, spec: FieldSpec):
    """(a + b) mod p, canonical in/out (single fused scan)."""
    return _finalize(a + b, spec)


def sub(a, b, spec: FieldSpec):
    """(a - b) mod p via a + p - b (branchless, single fused scan)."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    p = _consts_col(spec.p_limbs, len(batch)).astype(I32)
    return _finalize(a.astype(I32) + p - b.astype(I32), spec)


def neg(a, spec: FieldSpec):
    """(-a) mod p; maps 0 -> 0."""
    p = _consts_col(spec.p_limbs, a.ndim - 1).astype(I32)
    rows, _ = _carry_signed(p - a.astype(I32))
    return jnp.where(is_zero(a)[None], jnp.zeros_like(rows), rows)


def double(a, spec: FieldSpec):
    return add(a, a, spec)


def mont_mul(a, b, spec: FieldSpec):
    """CIOS Montgomery product a*b*R^-1 mod p.

    Valid for a < 2^256 (any canonical limbs) and b < p; result < p.
    Lazy-carry bound: t rows grow by < 4*2^16 per outer iteration plus a
    < 2^16 shifted carry; after 16 iterations rows are < ~2^23 << 2^32.
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    nl = spec.n_limbs
    inv = U32(spec.inv)
    p = _consts_col(spec.p_limbs, len(batch))
    zrow = jnp.zeros((1, *batch), U32)
    bb = jnp.broadcast_to(b, (nl, *batch))

    def body(t, ai):
        prod = ai * bb  # (16, *batch)
        t = t + jnp.concatenate([prod & MASK, zrow]) \
              + jnp.concatenate([zrow, prod >> 16])
        m = (t[0] * inv) & MASK
        prod = m * p
        t = t + jnp.concatenate([prod & MASK, zrow]) \
              + jnp.concatenate([zrow, prod >> 16])
        carry = t[0] >> 16  # low 16 bits are zero by construction of m
        t = jnp.concatenate([t[1:], zrow]).at[0].add(carry)
        return t, None

    t0 = jnp.zeros((nl + 1, *batch), U32)
    t, _ = jax.lax.scan(
        body, t0, jnp.broadcast_to(a, (nl, *batch)), unroll=UNROLL
    )
    # rows < ~2^23; value < 2p < 2^255 — fused carry + conditional subtract
    return _finalize(t, spec)


def square(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def pow_const(a, e: int, spec: FieldSpec):
    """a^e for a fixed Python-int exponent.

    LSB-first square-and-multiply via `lax.scan` over the static bit array —
    the montmul body is traced once, keeping compiles fast.
    """
    one = jnp.broadcast_to(ones(a.shape[1:], spec), a.shape)
    if e == 0:
        return one
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], U32)

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit != 0, mont_mul(result, base, spec), result)
        base = mont_mul(base, base, spec)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (one, a), bits)
    return result


def inv(a, spec: FieldSpec):
    """a^(p-2) (Fermat). Maps 0 -> 0. ~500 montmuls; use batch_inverse for bulk."""
    return pow_const(a, spec.p - 2, spec)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def select(cond, a, b):
    """cond: (*batch,) bool; a, b: (16, *batch) -> where(cond, a, b)."""
    return jnp.where(cond[None], a, b)


def zeros(batch, spec: FieldSpec):
    return jnp.zeros((spec.n_limbs, *batch), U32)


def ones(batch, spec: FieldSpec):
    return jnp.broadcast_to(
        _consts_col(spec.r1_limbs, len(batch)), (spec.n_limbs, *batch)
    )


def const(v: int, spec: FieldSpec, batch_ndim: int = 0):
    """Host int (standard form) -> (n_limbs, 1...) Montgomery limbs on device."""
    limbs = np.frombuffer(
        ((v % spec.p) * spec.mont_r % spec.p).to_bytes(2 * spec.n_limbs, "little"),
        dtype=np.uint16,
    ).astype(np.uint32)
    return _consts_col(limbs, batch_ndim)


# ---------------------------------------------------------------------------
# Relaxed-form helpers: limbwise uint32 sums of up to 2^16 canonical values
# (no carries), reduced exactly afterwards. This is what makes segment-sum /
# SpMV TPU-shaped: the inner reduction is a plain uint32 add and the modular
# cleanup is three Montgomery muls.
# ---------------------------------------------------------------------------


def reduce_relaxed(t, spec: FieldSpec):
    """Relaxed limbs (16 rows < 2^32; value < 2^272) -> canonical < p.

    V = hi*2^256 + lo (hi < 2^16 after carry propagation):
      V*R mod p = montmul(hi, R3) + montmul(lo, R2)
      V   mod p = montmul(V*R mod p, 1)
    """
    limbs, top = _carry_canonical(t)
    nl = spec.n_limbs
    lo = limbs[:nl]
    nb = t.ndim - 1
    lo_r = mont_mul(lo, _consts_col(spec.r2_limbs, nb), spec)
    hi = jnp.concatenate([top[None], jnp.zeros((nl - 1, *top.shape), U32)])
    hi_r = mont_mul(hi, _consts_col(spec.r3_limbs, nb), spec)
    vr = add(lo_r, hi_r, spec)
    one_std = jnp.zeros_like(vr).at[0].set(1)
    return mont_mul(vr, one_std, spec)


def normalize_to_std(a, spec: FieldSpec):
    """Montgomery form -> standard-form limbs (montmul by 1)."""
    one_std = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one_std, spec)


def std_to_mont(a, spec: FieldSpec):
    """Standard-form limbs (< 2^256) -> Montgomery form (montmul by R^2)."""
    return mont_mul(a, _consts_col(spec.r2_limbs, a.ndim - 1), spec)


class Field:
    """Jitted, spec-bound ops over limb-major arrays. See FR_OPS / FQ_OPS."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        s = dict(spec=spec)
        self.add = jax.jit(partial(add, **s))
        self.sub = jax.jit(partial(sub, **s))
        self.neg = jax.jit(partial(neg, **s))
        self.mul = jax.jit(partial(mont_mul, **s))
        self.square = jax.jit(partial(square, **s))
        self.inv = jax.jit(partial(inv, **s))
        self.double = jax.jit(partial(double, **s))
        self.reduce_relaxed = jax.jit(partial(reduce_relaxed, **s))
        self.to_std = jax.jit(partial(normalize_to_std, **s))
        self.to_mont = jax.jit(partial(std_to_mont, **s))

    # host-side conveniences (limb-major: (16, n))
    def encode(self, vals):
        return jnp.asarray(self.spec.encode(vals).T)

    def decode(self, arr):
        a = np.asarray(arr)
        return self.spec.decode(a.reshape(self.spec.n_limbs, -1).T)

    def const(self, v: int, batch_ndim: int = 0):
        return const(v, self.spec, batch_ndim)


from .spec import FR as _FR_SPEC, FQ as _FQ_SPEC  # noqa: E402

FR_OPS = Field(_FR_SPEC)
FQ_OPS = Field(_FQ_SPEC)

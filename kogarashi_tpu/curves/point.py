"""Generic batched short-Weierstrass point kernels (y^2 = x^3 + b, a = 0).

Points are homogeneous projective (X:Y:Z) pytrees `(x, y, z)` of coefficient
arrays; identity is (0:1:0). All formulas are the *complete* RCB16 ones
(eprint 2015/1060, Algorithms 7/9 for a=0) — branchless, so one trace serves
identity/doubling/generic lanes alike. This is the same formula family the
reference uses in-circuit (zkstd/src/circuit/gadget/curve.rs:89-158); its
native path's branchy Jacobian code (zkstd/src/arithmetic/points/weierstrass.rs)
has no TPU analogue by design.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .algebra import BaseAlg, Fq2Alg
from ..fields.spec import FieldSpec, N_LIMBS


@dataclass(frozen=True)
class CurveCfg:
    """Static curve description. `alg` builds the coefficient algebra."""

    name: str
    alg: Any  # BaseAlg | Fq2Alg (stateless wrappers, safe to close over)
    b3: Any  # int for base fields, (int, int) for Fq2 — standard form
    scalar_spec: FieldSpec  # scalar field (for order / bit-length)
    generator: Any  # (x, y) ints or int-pairs

    def __hash__(self):
        return hash((self.name,))

    def __eq__(self, o):
        return isinstance(o, CurveCfg) and o.name == self.name


def identity(cfg: CurveCfg, batch=()):
    a = cfg.alg
    return (a.zero(batch), a.one(batch), a.zero(batch))


def generator(cfg: CurveCfg, batch_ndim: int = 0):
    a = cfg.alg
    gx, gy = cfg.generator
    return (a.const(gx, batch_ndim), a.const(gy, batch_ndim), a.one(() if batch_ndim == 0 else (1,) * batch_ndim))


def is_identity(cfg: CurveCfg, p):
    return cfg.alg.is_zero(p[2])


def pneg(cfg: CurveCfg, p):
    return (p[0], cfg.alg.neg(p[1]), p[2])


def pselect(cfg: CurveCfg, cond, p, q):
    a = cfg.alg
    return (a.select(cond, p[0], q[0]), a.select(cond, p[1], q[1]), a.select(cond, p[2], q[2]))


def padd(cfg: CurveCfg, p, q):
    """Complete projective add (RCB16 Alg 7, a=0). 12M + 2 b3-mults."""
    a = cfg.alg
    x1, y1, z1 = p
    x2, y2, z2 = q
    nb = len(a.batch_shape(x1))
    b3 = a.const(cfg.b3, nb)

    t0 = a.mul(x1, x2)
    t1 = a.mul(y1, y2)
    t2 = a.mul(z1, z2)
    t3 = a.sub(a.sub(a.mul(a.add(x1, y1), a.add(x2, y2)), t0), t1)
    t4 = a.sub(a.sub(a.mul(a.add(y1, z1), a.add(y2, z2)), t1), t2)
    t5 = a.sub(a.sub(a.mul(a.add(x1, z1), a.add(x2, z2)), t0), t2)
    t6 = a.add(a.double(t0), t0)  # 3*X1X2
    t2b3 = a.mul(t2, b3)
    zz = a.add(t1, t2b3)
    tt = a.sub(t1, t2b3)
    y5 = a.mul(t5, b3)
    x3 = a.sub(a.mul(t3, tt), a.mul(t4, y5))
    y3 = a.add(a.mul(y5, t6), a.mul(tt, zz))
    z3 = a.add(a.mul(zz, t4), a.mul(t6, t3))
    return (x3, y3, z3)


def pdouble(cfg: CurveCfg, p):
    """Complete projective doubling (RCB16 Alg 9, a=0)."""
    a = cfg.alg
    x, y, z = p
    nb = len(a.batch_shape(x))
    b3 = a.const(cfg.b3, nb)

    t0 = a.square(y)
    z3 = a.double(a.double(a.double(t0)))  # 8Y^2
    t1 = a.mul(y, z)
    t2 = a.mul(a.square(z), b3)
    x3 = a.mul(t2, z3)
    y3 = a.add(t0, t2)
    z3 = a.mul(t1, z3)
    t1 = a.double(t2)
    t2 = a.add(t1, t2)
    t0 = a.sub(t0, t2)
    y3 = a.add(a.mul(t0, y3), x3)
    x3 = a.double(a.mul(t0, a.mul(x, y)))
    return (x3, y3, z3)


def scalar_bits_from_std_limbs(scalars):
    """Standard-form scalar limbs (16, *batch) -> bits (256, *batch) LSB-first."""
    rows = []
    for j in range(256):
        rows.append((scalars[j // 16] >> (j % 16)) & jnp.uint32(1))
    return jnp.stack(rows)


def scalar_mul(cfg: CurveCfg, p, scalars):
    """[k]P, k given as standard-form limbs (16, *batch) of the scalar field.

    MSB-first double-and-add over 256 bits via lax.scan (one add + one double
    trace). Branchless: the add is always computed, selected by the bit.
    """
    bits = scalar_bits_from_std_limbs(scalars)  # (256, *batch) LSB-first
    bits = bits[::-1]  # MSB-first

    # broadcast a single base point against a batch of scalars (fixed-base use)
    batch = jnp.broadcast_shapes(cfg.alg.batch_shape(p[0]), scalars.shape[1:])
    if cfg.alg.batch_shape(p[0]) != batch:
        ext = p[0].ndim - 1 - len(cfg.alg.batch_shape(p[0]))
        full = p[0].shape[: ext + 1] + batch
        p = tuple(jnp.broadcast_to(c, full) for c in p)

    def body(acc, bit):
        acc = pdouble(cfg, acc)
        added = padd(cfg, acc, p)
        return pselect(cfg, bit != 0, added, acc), None

    init = identity(cfg, batch)
    out, _ = jax.lax.scan(body, init, bits)
    return out


def to_affine(cfg: CurveCfg, p):
    """(X:Y:Z) -> (X/Z, Y/Z, is_identity). Identity maps to (0, 0, True)."""
    a = cfg.alg
    x, y, z = p
    inf = is_identity(cfg, p)
    zinv = a.inv(z)
    ax = a.mul(x, zinv)
    ay = a.mul(y, zinv)
    zero = a.zero(a.batch_shape(x))
    return (a.select(inf, zero, ax), a.select(inf, zero, ay), inf)


def from_affine(cfg: CurveCfg, ax, ay, inf):
    """Affine coords + identity mask -> projective (identity -> (0:1:0))."""
    a = cfg.alg
    batch = a.batch_shape(ax)
    one = a.one(batch)
    zero = a.zero(batch)
    return (
        a.select(inf, zero, ax),
        a.select(inf, one, ay),
        a.select(inf, zero, one),
    )


def on_curve(cfg: CurveCfg, p):
    """Projective curve membership: Y^2 Z == X^3 + b Z^3 (identity passes)."""
    a = cfg.alg
    x, y, z = p
    nb = len(a.batch_shape(x))
    b3 = a.const(cfg.b3, nb)
    # b = b3 / 3: precompute b as const instead
    lhs = a.mul(a.square(y), z)
    rhs = a.add(a.mul(a.square(x), x), a.mul(a.mul(a.square(z), z), _b_const(cfg, nb)))
    return a.is_zero(a.sub(lhs, rhs)) | is_identity(cfg, p)


def _b_const(cfg: CurveCfg, nb: int):
    a = cfg.alg
    if a.ext_degree == 1:
        p = a.spec.p
        b = cfg.b3 * pow(3, -1, p) % p
        return a.const(b, nb)
    p = a.spec.p
    inv3 = pow(3, -1, p)
    return a.const((cfg.b3[0] * inv3 % p, cfg.b3[1] * inv3 % p), nb)

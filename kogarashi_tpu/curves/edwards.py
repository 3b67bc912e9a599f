"""Batched twisted-Edwards (a = -1) point kernels + the Jubjub instance.

Points are extended-coordinate pytrees `(x, y, t, z)` of limb-major arrays;
identity is (0:1:0:1). The unified a = -1 formulas are *complete* (d is a
non-square), so every op is branchless by construction — no identity selects
in the add path at all, unlike Weierstrass.

Parity: zkstd/src/arithmetic/points/edwards.rs (same formulas, batched),
zkstd/tests/jubjub.rs (Jubjub constants). Validated against pyref/edwards.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..fields.spec import BLS_FR as BLS_FR_SPEC, FieldSpec, N_LIMBS
from .algebra import BaseAlg
from .point import scalar_bits_from_std_limbs


@dataclass(frozen=True)
class EdwardsCfg:
    """Static twisted-Edwards curve description (a = -1)."""

    name: str
    alg: Any  # BaseAlg over the base field
    d: int  # curve constant, standard form
    order: int  # prime-order subgroup size
    generator: Any  # (x, y) ints

    def __hash__(self):
        return hash((self.name,))

    def __eq__(self, o):
        return isinstance(o, EdwardsCfg) and o.name == self.name


def identity(cfg: EdwardsCfg, batch=()):
    a = cfg.alg
    return (a.zero(batch), a.one(batch), a.zero(batch), a.one(batch))


def generator(cfg: EdwardsCfg, batch_ndim: int = 0):
    a = cfg.alg
    gx, gy = cfg.generator
    p = a.spec.p
    return (
        a.const(gx, batch_ndim),
        a.const(gy, batch_ndim),
        a.const(gx * gy % p, batch_ndim),
        a.one(() if batch_ndim == 0 else (1,) * batch_ndim),
    )


def is_identity(cfg: EdwardsCfg, p):
    a = cfg.alg
    return a.is_zero(p[0]) & a.is_zero(a.sub(p[1], p[3]))


def eneg(cfg: EdwardsCfg, p):
    a = cfg.alg
    return (a.neg(p[0]), p[1], a.neg(p[2]), p[3])


def eselect(cfg: EdwardsCfg, cond, p, q):
    a = cfg.alg
    return tuple(a.select(cond, pc, qc) for pc, qc in zip(p, q))


def eadd(cfg: EdwardsCfg, p, q):
    """Extended + extended (edwards.rs:74-95), complete. 9M + 1 d-mult."""
    a = cfg.alg
    x0, y0, t0, z0 = p
    x1, y1, t1, z1 = q
    nb = len(a.batch_shape(x0))
    dconst = a.const(cfg.d, nb)

    aa = a.mul(x0, x1)
    bb = a.mul(y0, y1)
    cc = a.mul(dconst, a.mul(t0, t1))
    dd = a.mul(z0, z1)
    h = a.add(aa, bb)
    e = a.sub(a.mul(a.add(x0, y0), a.add(x1, y1)), h)
    f = a.sub(dd, cc)
    g = a.add(dd, cc)
    return (a.mul(e, f), a.mul(g, h), a.mul(e, h), a.mul(f, g))


def edouble(cfg: EdwardsCfg, p):
    """Extended doubling, a = -1 (edwards.rs:99-116). 4M + 3S."""
    a = cfg.alg
    x, y, _, z = p
    aa = a.neg(a.square(x))
    bb = a.square(y)
    cc = a.double(a.square(z))
    dd = a.sub(aa, bb)
    e = a.double(a.mul(x, y))
    g = a.add(aa, bb)
    f = a.sub(g, cc)
    return (a.mul(e, f), a.mul(g, dd), a.mul(e, dd), a.mul(f, g))


def scalar_mul(cfg: EdwardsCfg, p, scalars):
    """[k]P, k as standard-form limbs (16, *batch) — MSB-first scan."""
    bits = scalar_bits_from_std_limbs(scalars)[::-1]  # MSB-first

    batch = jnp.broadcast_shapes(cfg.alg.batch_shape(p[0]), scalars.shape[1:])
    if cfg.alg.batch_shape(p[0]) != batch:
        full = p[0].shape[:1] + batch
        p = tuple(jnp.broadcast_to(c, full) for c in p)

    def body(acc, bit):
        acc = edouble(cfg, acc)
        added = eadd(cfg, acc, p)
        return eselect(cfg, bit != 0, added, acc), None

    init = identity(cfg, batch)
    out, _ = jax.lax.scan(body, init, bits)
    return out


def to_affine(cfg: EdwardsCfg, p):
    """(X:Y:T:Z) -> (X/Z, Y/Z). Z is never 0 on the curve."""
    a = cfg.alg
    x, y, _, z = p
    zinv = a.inv(z)
    return (a.mul(x, zinv), a.mul(y, zinv))


def from_affine(cfg: EdwardsCfg, ax, ay):
    a = cfg.alg
    return (ax, ay, a.mul(ax, ay), a.one(a.batch_shape(ax)))


def on_curve(cfg: EdwardsCfg, p):
    """(Y^2 - X^2) Z^2 == Z^4 + d X^2 Y^2  and  T Z == X Y."""
    a = cfg.alg
    x, y, t, z = p
    nb = len(a.batch_shape(x))
    dconst = a.const(cfg.d, nb)
    x2, y2, z2 = a.square(x), a.square(y), a.square(z)
    lhs = a.mul(a.sub(y2, x2), z2)
    rhs = a.add(a.square(z2), a.mul(dconst, a.mul(x2, y2)))
    eq = a.is_zero(a.sub(lhs, rhs))
    tz = a.is_zero(a.sub(a.mul(t, z), a.mul(x, y)))
    return eq & tz


class EdwardsCurve:
    """Spec-bound, jitted batched Edwards ops. Points are (x, y, t, z) pytrees."""

    def __init__(self, cfg: EdwardsCfg, pyref_spec):
        self.cfg = cfg
        self.pyref_spec = pyref_spec
        self.add = jax.jit(partial(eadd, cfg))
        self.double = jax.jit(partial(edouble, cfg))
        self.neg = jax.jit(partial(eneg, cfg))
        self.scalar_mul = jax.jit(partial(scalar_mul, cfg))
        self.to_affine = jax.jit(partial(to_affine, cfg))
        self.on_curve = jax.jit(partial(on_curve, cfg))

    def identity(self, batch=()):
        return identity(self.cfg, batch)

    def generator(self, batch_ndim: int = 0):
        return generator(self.cfg, batch_ndim)

    def encode_points(self, pts):
        """pyref EdwardsAffine points -> batched extended device point."""
        spec = self.cfg.alg.spec
        xs = jnp.asarray(spec.encode([p.x.v for p in pts]).T)
        ys = jnp.asarray(spec.encode([p.y.v for p in pts]).T)
        return from_affine(self.cfg, xs, ys)

    def decode_points(self, p):
        """Batched extended device point -> list of pyref EdwardsAffine."""
        from ..pyref.edwards import EdwardsAffine

        ax, ay = self.to_affine(p)
        spec = self.cfg.alg.spec
        xs = spec.decode(np.asarray(ax).T)
        ys = spec.decode(np.asarray(ay).T)
        F = self.pyref_spec.field
        return [
            EdwardsAffine(self.pyref_spec, F(x), F(y)) for x, y in zip(xs, ys)
        ]


def _mk_jubjub():
    from ..pyref.edwards import JUBJUB_SPEC

    return EdwardsCurve(
        EdwardsCfg(
            name="jubjub",
            alg=BaseAlg(BLS_FR_SPEC),
            d=C.JUBJUB_D,
            order=C.JUBJUB_ORDER,
            generator=C.JUBJUB_GEN,
        ),
        JUBJUB_SPEC,
    )


JUBJUB = _mk_jubjub()

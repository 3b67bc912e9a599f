"""Coefficient-field algebra namespaces for generic curve kernels.

A curve kernel (point add/double/scalar-mul) is written once against this
small interface and instantiated over:
  - `BaseAlg(spec)` — Fq or Fr, arrays (16, *batch)
  - `Fq2Alg()`      — Fq2 = Fq[u]/(u^2+1), arrays (2, 16, *batch)

This mirrors how the reference writes point formulas generically over a
`PrimeField` trait (zkstd/src/arithmetic/points/weierstrass.rs) — but as
shape-generic batched array ops instead of trait dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.spec import FieldSpec, N_LIMBS
from ..fields.spec import FQ as FQ_SPEC


class BaseAlg:
    """Algebra over a prime field; elements are (16, *batch) uint32."""

    ext_degree = 1

    def __init__(self, spec: FieldSpec):
        self.spec = spec

    def add(self, a, b):
        return mont.add(a, b, self.spec)

    def sub(self, a, b):
        return mont.sub(a, b, self.spec)

    def neg(self, a):
        return mont.neg(a, self.spec)

    def mul(self, a, b):
        return mont.mont_mul(a, b, self.spec)

    def square(self, a):
        return mont.mont_mul(a, a, self.spec)

    def double(self, a):
        return mont.add(a, a, self.spec)

    def inv(self, a):
        return mont.inv(a, self.spec)

    def zero(self, batch=()):
        return mont.zeros(batch, self.spec)

    def one(self, batch=()):
        return mont.ones(batch, self.spec)

    def const(self, v: int, batch_ndim: int = 0):
        return mont.const(v, self.spec, batch_ndim)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def select(self, cond, a, b):
        """cond: (*batch,) bool."""
        return jnp.where(cond[None], a, b)

    def batch_shape(self, a):
        return a.shape[1:]


class Fq2Alg:
    """Algebra over Fq2; elements are (2, 16, *batch) uint32 (c0 + c1*u)."""

    ext_degree = 2

    def __init__(self, spec: FieldSpec = FQ_SPEC):
        self.spec = spec
        self.base = BaseAlg(spec)

    def _pack(self, c0, c1):
        return jnp.stack([c0, c1])

    def add(self, a, b):
        return self._pack(self.base.add(a[0], b[0]), self.base.add(a[1], b[1]))

    def sub(self, a, b):
        return self._pack(self.base.sub(a[0], b[0]), self.base.sub(a[1], b[1]))

    def neg(self, a):
        return self._pack(self.base.neg(a[0]), self.base.neg(a[1]))

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        # Karatsuba over u^2 = -1: 3 base muls
        m0 = self.base.mul(a[0], b[0])
        m1 = self.base.mul(a[1], b[1])
        m2 = self.base.mul(self.base.add(a[0], a[1]), self.base.add(b[0], b[1]))
        c0 = self.base.sub(m0, m1)
        c1 = self.base.sub(self.base.sub(m2, m0), m1)
        return self._pack(c0, c1)

    def square(self, a):
        # (a0+a1)(a0-a1), 2*a0*a1 — 2 base muls
        c0 = self.base.mul(self.base.add(a[0], a[1]), self.base.sub(a[0], a[1]))
        c1 = self.base.double(self.base.mul(a[0], a[1]))
        return self._pack(c0, c1)

    def inv(self, a):
        n = self.base.inv(
            self.base.add(self.base.square(a[0]), self.base.square(a[1]))
        )
        return self._pack(self.base.mul(a[0], n), self.base.neg(self.base.mul(a[1], n)))

    def zero(self, batch=()):
        return jnp.zeros((2, N_LIMBS, *batch), jnp.uint32)

    def one(self, batch=()):
        return self._pack(self.base.one(batch), self.base.zero(batch))

    def const(self, v, batch_ndim: int = 0):
        """v: (c0, c1) int pair."""
        c0, c1 = v
        return self._pack(
            self.base.const(c0, batch_ndim), self.base.const(c1, batch_ndim)
        )

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, cond, a, b):
        return jnp.where(cond[None, None], a, b)

    def batch_shape(self, a):
        return a.shape[2:]

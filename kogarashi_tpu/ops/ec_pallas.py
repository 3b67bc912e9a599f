"""Fused Pallas TPU kernels for batched short-Weierstrass point arithmetic.

Built on the 13-bit limb engine (fields/mont_pallas.py). Three kernel families:

  - `scan_mixed`: per-chunk inclusive prefix scan under projective+affine
    (mixed) addition — the Pippenger bucket-accumulation workhorse. The scan
    runs INSIDE the kernel (grid-carried scratch accumulator), so the ~22k
    lane-ops of each point add never touch HBM.
  - `scan_proj`:  same, projective+projective (for chunk totals and bucket
    suffix sums).
  - `map_padd` / `map_pdouble`: batched pointwise add / double.

Formulas are the complete RCB16 ones (eprint 2015/1060 Alg 7/8/9 for a=0),
matching curves/point.py and the reference's in-circuit formulas
(zkstd/src/circuit/gadget/curve.rs:89-158); identity is (0:1:0) and all
control flow is branchless.

Bound proofs (values as multiples of p; `mm` maps <8p inputs to <1.76p):
projective coordinates arriving at any formula are < 4p and leave < 4p
(closure); affine inputs are canonical (<= p after in-driver negation).
Each call below is annotated where the bound is tight. There are NO
approximate reductions anywhere — every op is exact.

Layout: a batch of points is a pytree of int32 arrays shaped
(n_limbs=20, L, C) — limb-major, scan position j in [0,L), chunk c in [0,C) —
where C is tiled as (Ct, sub, 128) lane groups. Element s of chunk c sits at
[:, s, c]: each scan step is a full (sub, 128)-lane vector op over sub*128
independent chunks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import mont_pallas as M
from ..fields.mont_pallas import MontConsts
from ..fields.spec import FieldSpec

I32 = jnp.int32


class BaseAlgK:
    """Base-field coefficient algebra: elements are (nl, *tile) i32 limb
    arrays. Contract used by the generic formulas below: `mul`/`sqr` output
    values < 2p (mm gives < 1.76p); add/sub are exact with static bounds."""

    ext = 1

    def __init__(self, K: MontConsts):
        self.K = K

    def mul(self, a, b):
        return M.mm(a, b, self.K)

    def sqr(self, a):
        return M.sqr(a, self.K)

    def add(self, a, b):
        return M.modadd(a, b)

    def add3(self, a, b, c):
        return M.modadd3(a, b, c)

    def sub(self, a, b, k):
        return M.modsub(a, b, self.K, k)

    def sub2(self, a, b, c, kb, kc):
        return M.modsub2(a, b, c, self.K, kb, kc)

    def neg(self, a, k):
        return M.neg(a, self.K, k)

    def cond_sub(self, a, k):
        return M.cond_sub(a, self.K, k)

    def const(self, t, tile):
        """Limb tuple -> (nl, *tile) const rows."""
        return M._rows(t, tile)

    def zero(self, tile):
        return M.zero(self.K, tile)

    def one(self, tile):
        return M.one(self.K, tile)


class Fq2AlgK:
    """Fq2 = Fq[u]/(u^2+1) algebra: elements are (2*nl, *tile) arrays, c0
    stacked over c1. Karatsuba mul = 3 base mm; cond-subtracts restore the
    same `mul output < 2p` contract the generic formulas assume."""

    ext = 2

    def __init__(self, K: MontConsts):
        self.K = K
        self.n = K.n

    def _split(self, a):
        return a[: self.n], a[self.n :]

    def mul(self, a, b):
        K, n = self.K, self.n
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        m0 = M.mm(a0, b0, K)                       # [1.76]
        m1 = M.mm(a1, b1, K)
        m2 = M.mm(M.modadd(a0, a1), M.modadd(b0, b1), K)   # inputs < 8p
        c0 = M.cond_sub(M.modsub(m0, m1, K, 2), K, 2)      # [3.76] -> [<2]
        c1 = M.cond_sub(
            M.cond_sub(M.modsub2(m2, m0, m1, K, 2, 2), K, 4), K, 2
        )  # [5.76] -> [<2]
        return jnp.concatenate([c0, c1])

    def sqr(self, a):
        K = self.K
        a0, a1 = self._split(a)
        # (a0+a1)(a0-a1) + 2 a0 a1 u; inputs < 4p componentwise
        c0 = M.cond_sub(
            M.mm(M.modadd(a0, a1), M.modsub(a0, a1, K, 4), K), K, 2
        )
        m = M.mm(a0, a1, K)
        c1 = M.cond_sub(M.modadd(m, m), K, 2)
        return jnp.concatenate([c0, c1])

    def _each(self, f, *arrs):
        parts0 = f(*[a[: self.n] for a in arrs])
        parts1 = f(*[a[self.n :] for a in arrs])
        return jnp.concatenate([parts0, parts1])

    def add(self, a, b):
        return self._each(M.modadd, a, b)

    def add3(self, a, b, c):
        return self._each(M.modadd3, a, b, c)

    def sub(self, a, b, k):
        return self._each(lambda x, y: M.modsub(x, y, self.K, k), a, b)

    def sub2(self, a, b, c, kb, kc):
        return self._each(
            lambda x, y, z: M.modsub2(x, y, z, self.K, kb, kc), a, b, c
        )

    def neg(self, a, k):
        return self._each(lambda x: M.neg(x, self.K, k), a)

    def cond_sub(self, a, k):
        return self._each(lambda x: M.cond_sub(x, self.K, k), a)

    def const(self, t, tile):
        """((c0 limbs), (c1 limbs)) -> (2*nl, *tile)."""
        return jnp.concatenate([M._rows(t[0], tile), M._rows(t[1], tile)])

    def zero(self, tile):
        return jnp.zeros((2 * self.n, *tile), I32)

    def one(self, tile):
        return jnp.concatenate(
            [M.one(self.K, tile), jnp.zeros((self.n, *tile), I32)]
        )


@dataclass(frozen=True)
class CurveK:
    """Static curve constants for the kernels (base field + b3, Montgomery
    R' = 2^260 form, scalar literals only). ext=2 selects the Fq2 algebra
    (G2); coord arrays then have 2*nl limb rows."""

    name: str
    K: MontConsts
    b3_t: tuple  # limb tuple (ext=1) or pair of limb tuples (ext=2)
    ext: int = 1

    @staticmethod
    @lru_cache(maxsize=8)
    def make(name: str, spec: FieldSpec, b3_std) -> "CurveK":
        K = MontConsts.make(spec)
        if isinstance(b3_std, tuple):
            b3_t = (K.const_tuple(b3_std[0]), K.const_tuple(b3_std[1]))
            return CurveK(name=name, K=K, b3_t=b3_t, ext=2)
        return CurveK(name=name, K=K, b3_t=K.const_tuple(b3_std), ext=1)

    @property
    def alg(self):
        return Fq2AlgK(self.K) if self.ext == 2 else BaseAlgK(self.K)

    @property
    def rows(self) -> int:
        """Limb rows per coordinate array."""
        return self.ext * self.K.n

    def __hash__(self):
        return hash(self.name)


# ---------------------------------------------------------------------------
# Trace-level point formulas, generic over the coefficient algebra.
#
# Bound proofs (multiples of p, componentwise for Fq2): `mul`/`sqr` output
# < 2p; projective coords arrive < 4p (x,z strictly; y <= 4p only for the
# driver's negated points, absorbed by the slack below) and leave < 4p.
# Affine inputs are canonical (<= p). Every `mul` input stays < 8p.
# ---------------------------------------------------------------------------


def identity_tile(ck: CurveK, tile):
    a = ck.alg
    return (a.zero(tile), a.one(tile), a.zero(tile))


def madd(ck: CurveK, acc, x2, y2):
    """Complete mixed add acc(projective) + (x2, y2, 1): RCB16 Alg 8, a=0."""
    a = ck.alg
    b3 = a.const(ck.b3_t, acc[0].shape[1:])
    x1, y1, z1 = acc
    t0 = a.mul(x1, x2)                    # [2]
    t1 = a.mul(y1, y2)                    # [2]
    s1 = a.add(x1, y1)                    # [<8]
    s2 = a.add(x2, y2)                    # [2]
    t3 = a.sub2(a.mul(s2, s1), t0, t1, 2, 2)      # [6]
    t4 = a.add(a.mul(z1, y2), y1)         # [6]
    t5 = a.add(a.mul(z1, x2), x1)         # [6]
    t6 = a.add3(t0, t0, t0)               # [6]
    t2 = a.mul(b3, z1)                    # [2]
    zz = a.add(t1, t2)                    # [4]
    tt = a.sub(t1, t2, 2)                 # [4]
    y5 = a.mul(b3, t5)                    # [2]
    x3 = a.sub(a.mul(t3, tt), a.mul(t4, y5), 2)   # [4]
    y3 = a.add(a.mul(y5, t6), a.mul(tt, zz))      # [4]
    z3 = a.add(a.mul(zz, t4), a.mul(t6, t3))      # [4]
    return (x3, y3, z3)


def padd(ck: CurveK, p, q):
    """Complete projective add: RCB16 Alg 7, a=0."""
    a = ck.alg
    b3 = a.const(ck.b3_t, p[0].shape[1:])
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = a.mul(x1, x2)
    t1 = a.mul(y1, y2)
    t2 = a.mul(z1, z2)
    t3 = a.sub2(a.mul(a.add(x1, y1), a.add(x2, y2)), t0, t1, 2, 2)  # [6]
    t4 = a.sub2(a.mul(a.add(y1, z1), a.add(y2, z2)), t1, t2, 2, 2)
    t5 = a.sub2(a.mul(a.add(x1, z1), a.add(x2, z2)), t0, t2, 2, 2)
    t6 = a.add3(t0, t0, t0)               # [6]
    t2b3 = a.mul(b3, t2)                  # [2]
    zz = a.add(t1, t2b3)                  # [4]
    tt = a.sub(t1, t2b3, 2)               # [4]
    y5 = a.mul(b3, t5)                    # [2]
    x3 = a.sub(a.mul(t3, tt), a.mul(t4, y5), 2)   # [4]
    y3 = a.add(a.mul(y5, t6), a.mul(tt, zz))      # [4]
    z3 = a.add(a.mul(zz, t4), a.mul(t6, t3))      # [4]
    return (x3, y3, z3)


def pdouble(ck: CurveK, p):
    """Complete projective doubling: RCB16 Alg 9, a=0."""
    a = ck.alg
    b3 = a.const(ck.b3_t, p[0].shape[1:])
    x, y, z = p
    t0 = a.sqr(y)                         # [2]
    t0d = a.add(t0, t0)                   # [4] = 2y^2
    t1 = a.mul(y, z)                      # [2]
    t2 = a.mul(b3, a.sqr(z))              # [2]
    xh = a.mul(t2, t0d)                   # [2] = 2 t2 y^2
    w8 = a.cond_sub(a.add(a.add(xh, xh), a.add(xh, xh)), 4)   # 8 t2 y^2 [<4]
    zh = a.mul(t1, t0d)                   # [2]
    z3 = a.cond_sub(a.add(a.add(zh, zh), a.add(zh, zh)), 4)   # 8 t1 y^2 [<4]
    y3m = a.add(t0, t2)                   # [4]
    t2t = a.add3(t2, t2, t2)              # [6]
    t0s = a.sub(t0, t2t, 6)               # [8] (strict: t0 < 2p)
    y3 = a.cond_sub(a.add(a.mul(t0s, y3m), w8), 2)            # [<4]
    xf = a.mul(t0s, a.mul(x, y))          # [2]
    x3 = a.add(xf, xf)                    # [4]
    return (x3, y3, z3)


def pneg(ck: CurveK, p):
    """(x, -y, z); y < 4p -> 4p - y <= 4p (equality only when y == 0 mod p;
    consumer bounds have slack)."""
    return (p[0], ck.alg.neg(p[1], 4), p[2])


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _scan_kernel(ck: CurveK, L_blk: int, mixed: bool, *refs):
    """Grid (Ct, L/L_blk): inclusive per-chunk scan; acc carried in scratch."""
    if mixed:
        x_ref, y_ref, ox, oy, oz, acc = refs
    else:
        x_ref, y_ref, z_ref, ox, oy, oz, acc = refs
    lb = pl.program_id(1)
    tile = acc.shape[2:]

    @pl.when(lb == 0)
    def _():
        ix, iy, iz = identity_tile(ck, tile)
        acc[0] = ix
        acc[1] = iy
        acc[2] = iz

    a = (acc[0], acc[1], acc[2])
    for j in range(L_blk):
        if mixed:
            a = madd(ck, a, x_ref[:, j, 0], y_ref[:, j, 0])
        else:
            a = padd(ck, a, (x_ref[:, j, 0], y_ref[:, j, 0], z_ref[:, j, 0]))
        ox[:, j, 0] = a[0]
        oy[:, j, 0] = a[1]
        oz[:, j, 0] = a[2]
    acc[0] = a[0]
    acc[1] = a[1]
    acc[2] = a[2]


def _tile_of(C: int):
    """Pick (Ct, sub) with C = Ct*sub*128, preferring full (8,128) tiles."""
    assert C % 128 == 0, C
    lanes = C // 128
    sub = 8 if lanes % 8 == 0 else 1
    return lanes // sub, sub


@lru_cache(maxsize=64)
def _scan_call(ck: CurveK, L: int, C: int, L_blk: int, mixed: bool, interpret: bool):
    n = ck.rows
    Ct, sub = _tile_of(C)
    grid = (Ct, L // L_blk)
    blk = (n, L_blk, 1, sub, 128)
    spec = pl.BlockSpec(blk, lambda ct, lb: (0, lb, ct, 0, 0))
    n_in = 2 if mixed else 3
    kernel = partial(_scan_kernel, ck, L_blk, mixed)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, L, Ct, sub, 128), I32) for _ in range(3)
        ),
        scratch_shapes=[pltpu.VMEM((3, n, sub, 128), I32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )

    def run(*coords):
        shaped = tuple(c.reshape(n, L, Ct, sub, 128) for c in coords)
        out = call(*shaped)
        return tuple(o.reshape(n, L, C) for o in out)

    return run


def _blk_of(L: int, L_blk: int) -> int:
    """Largest block size <= L_blk that divides L (grid must tile L exactly)."""
    b = min(L_blk, L)
    while L % b:
        b -= 1
    return b


@lru_cache(maxsize=16)
def _scan_xla_jit(ck: CurveK, mixed: bool):
    def run(arrs):
        moved = tuple(jnp.moveaxis(a, 1, 0) for a in arrs)  # (L, n, C)

        def body(acc, row):
            if mixed:
                acc = madd(ck, acc, row[0], row[1])
            else:
                acc = padd(ck, acc, (row[0], row[1], row[2]))
            return acc, acc

        init = identity_tile(ck, (arrs[0].shape[2],))
        _, S = jax.lax.scan(body, init, moved)
        return tuple(jnp.moveaxis(s, 0, 1) for s in S)  # (n, L, C)

    return jax.jit(run)


@lru_cache(maxsize=16)
def _padd_jit(ck: CurveK):
    return jax.jit(partial(padd, ck))


@lru_cache(maxsize=16)
def _pdouble_jit(ck: CurveK):
    return jax.jit(partial(pdouble, ck))


def _scan_xla(ck: CurveK, arrs, mixed: bool):
    """Pure-XLA executor for the scan kernels: lax.scan over the L axis.

    Same math as `_scan_kernel` (one traced add body); used on the CPU test
    path where Mosaic is unavailable and interpret mode is too slow. Jitted
    with a trace cache so repeated same-shape calls don't re-trace the ~25k-op
    formula bodies."""
    return _scan_xla_jit(ck, mixed)(arrs)


# mode: "pallas" (Mosaic kernels), "interpret" (pallas interpreter),
# "xla" (pure-JAX executor; CPU test path)
def scan_mixed(ck: CurveK, x, y, L_blk: int = 1, mode: str = "pallas"):
    """Per-chunk inclusive scan of mixed adds.

    x, y: (n, L, C) i32 canonical affine limbs. Returns (Sx, Sy, Sz):
    (n, L, C) — S[:, j, c] = sum of chunk c's elements 0..j (projective)."""
    n, L, C = x.shape
    if mode == "xla":
        return _scan_xla(ck, (x, y), True)
    return _scan_call(ck, L, C, _blk_of(L, L_blk), True, mode == "interpret")(x, y)


def scan_proj(ck: CurveK, x, y, z, L_blk: int = 1, mode: str = "pallas"):
    """Per-chunk inclusive scan of projective adds; args (n, L, C)."""
    n, L, C = x.shape
    if mode == "xla":
        return _scan_xla(ck, (x, y, z), False)
    return _scan_call(ck, L, C, _blk_of(L, L_blk), False, mode == "interpret")(x, y, z)


def _map_kernel(ck: CurveK, op: str, *refs):
    if op == "padd":
        x1, y1, z1, x2, y2, z2, ox, oy, oz = refs
        r = padd(ck, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
    elif op.startswith("pdouble"):
        times = int(op.split(":")[1])
        x1, y1, z1, ox, oy, oz = refs
        r = jax.lax.fori_loop(
            0, times, lambda _, p: pdouble(ck, p), (x1[:], y1[:], z1[:])
        )
    else:
        raise AssertionError(op)
    ox[:] = r[0]
    oy[:] = r[1]
    oz[:] = r[2]


@lru_cache(maxsize=64)
def _map_call(ck: CurveK, C: int, op: str, interpret: bool):
    n = ck.rows
    Ct, sub = _tile_of(C)
    blk = (n, 1, sub, 128)
    spec = pl.BlockSpec(blk, lambda ct: (0, ct, 0, 0))
    n_in = 6 if op == "padd" else 3
    call = pl.pallas_call(
        partial(_map_kernel, ck, op),
        grid=(Ct,),
        in_specs=[spec] * n_in,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, Ct, sub, 128), I32) for _ in range(3)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )

    def run(*coords):
        shaped = tuple(c.reshape(n, Ct, sub, 128) for c in coords)
        out = call(*shaped)
        return tuple(o.reshape(n, C) for o in out)

    return run


def map_padd(ck: CurveK, p, q, mode: str = "pallas"):
    """Pointwise complete add of two (n, C) projective point batches."""
    if mode == "xla":
        return _padd_jit(ck)(p, q)
    C = p[0].shape[-1]
    return _map_call(ck, C, "padd", mode == "interpret")(*p, *q)


def map_pdouble(ck: CurveK, p, mode: str = "pallas", times: int = 1):
    """`times`-fold doubling fused in one kernel (window-combine phase)."""
    if mode == "xla":
        out = p
        for _ in range(times):
            out = _pdouble_jit(ck)(out)
        return out
    C = p[0].shape[-1]
    return _map_call(ck, C, f"pdouble:{times}", mode == "interpret")(*p)

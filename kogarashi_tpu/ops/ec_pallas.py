"""Fused Pallas TPU kernels for batched short-Weierstrass point arithmetic.

Three kernels built on fields/mont_pallas.py (straight-line int32 Montgomery
limb math, everything resident in VMEM/registers):

  - `scan_mixed`: per-chunk inclusive prefix scan under projective+affine
    (mixed) addition — the Pippenger bucket-accumulation workhorse. The scan
    runs INSIDE the kernel (grid-carried scratch accumulator), so the ~35k
    lane-ops of each point add never touch HBM.
  - `scan_proj`:  same, projective+projective (for scanning chunk totals and
    bucket suffix sums).
  - `map_padd` / `map_pdouble`: batched pointwise add / double.

Formulas are the complete RCB16 ones (eprint 2015/1060 Alg 7/8/9 for a=0),
matching curves/point.py and the reference's in-circuit formulas
(zkstd/src/circuit/gadget/curve.rs:89-158); identity is (0:1:0) and all
control flow is branchless, so one trace covers identity/doubling/generic.

Layout: a batch of points is a pytree of int32 arrays shaped
(n_limbs, L, C) — limb-major, scan position j in [0,L), chunk c in [0,C) —
where C = Ct * sub * 128 is tiled as (Ct, sub, 128) lane groups. Chunks are
columns: element s of chunk c sits at [:, s, c], so each scan step is a full
(sub, 128)-lane vector op over 128*sub independent chunks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import mont_pallas as M
from ..fields.mont_pallas import MontConsts
from ..fields.spec import FieldSpec

I32 = jnp.int32


@dataclass(frozen=True)
class CurveK:
    """Static curve constants for the kernels (base field + b3 in mont form)."""

    name: str
    K: MontConsts
    b3_t: tuple  # Montgomery-form strict limb tuple of 3b (scalar literals)

    @staticmethod
    @lru_cache(maxsize=8)
    def make(name: str, spec: FieldSpec, b3_std: int) -> "CurveK":
        K = MontConsts.make(spec)
        return CurveK(name=name, K=K, b3_t=K.const_tuple(b3_std))

    def __hash__(self):
        return hash(self.name)


# ---------------------------------------------------------------------------
# Trace-level point formulas (operate on (n, *tile) i32 limb arrays)
# ---------------------------------------------------------------------------


def identity_tile(ck: CurveK, tile):
    return (M.zero(ck.K, tile), M.one(ck.K, tile), M.zero(ck.K, tile))


def madd(ck: CurveK, acc, x2, y2):
    """Complete mixed add acc(projective) + (x2, y2, 1): RCB16 Alg 8, a=0.

    x2, y2 must be canonical (< p, strict limbs). 11 Montgomery muls.
    """
    K = ck.K
    b3 = M._rows(ck.b3_t, acc[0].shape[1:])
    x1, y1, z1 = acc
    sxy2 = M.ripple(x2 + y2)  # < 2p, strict
    t0 = M.mm(x1, x2, K)
    t1 = M.mm(y1, y2, K)
    t3 = M.mm(M.modadd(x1, y1, K), sxy2, K)
    t3 = M.modsub2(t3, t0, t1, K)  # x1*y2 + x2*y1
    t4 = M.modadd(M.mm(z1, y2, K), y1, K)  # y1 + y2*z1
    t5 = M.modadd(M.mm(z1, x2, K), x1, K)  # x1 + x2*z1
    t6 = M.triple(t0, K)  # 3*x1*x2
    t2b3 = M.mm(b3, z1, K)  # b3*z1*z2 (z2 = 1)
    zz = M.modadd(t1, t2b3, K)
    tt = M.modsub(t1, t2b3, K)
    y5 = M.mm(b3, t5, K)
    x3 = M.modsub(M.mm(t3, tt, K), M.mm(t4, y5, K), K)
    y3 = M.modadd(M.mm(y5, t6, K), M.mm(tt, zz, K), K)
    z3 = M.modadd(M.mm(zz, t4, K), M.mm(t6, t3, K), K)
    return (x3, y3, z3)


def padd(ck: CurveK, p, q):
    """Complete projective add: RCB16 Alg 7, a=0. 14 Montgomery muls."""
    K = ck.K
    b3 = M._rows(ck.b3_t, p[0].shape[1:])
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = M.mm(x1, x2, K)
    t1 = M.mm(y1, y2, K)
    t2 = M.mm(z1, z2, K)
    t3 = M.modsub2(M.mm(M.modadd(x1, y1, K), M.modadd(x2, y2, K), K), t0, t1, K)
    t4 = M.modsub2(M.mm(M.modadd(y1, z1, K), M.modadd(y2, z2, K), K), t1, t2, K)
    t5 = M.modsub2(M.mm(M.modadd(x1, z1, K), M.modadd(x2, z2, K), K), t0, t2, K)
    t6 = M.triple(t0, K)
    t2b3 = M.mm(b3, t2, K)
    zz = M.modadd(t1, t2b3, K)
    tt = M.modsub(t1, t2b3, K)
    y5 = M.mm(b3, t5, K)
    x3 = M.modsub(M.mm(t3, tt, K), M.mm(t4, y5, K), K)
    y3 = M.modadd(M.mm(y5, t6, K), M.mm(tt, zz, K), K)
    z3 = M.modadd(M.mm(zz, t4, K), M.mm(t6, t3, K), K)
    return (x3, y3, z3)


def pdouble(ck: CurveK, p):
    """Complete projective doubling: RCB16 Alg 9, a=0. 8 Montgomery muls."""
    K = ck.K
    b3 = M._rows(ck.b3_t, p[0].shape[1:])
    x, y, z = p
    t0 = M.mm(y, y, K)
    z3 = M.modadd(t0, t0, K)
    z3 = M.modadd(z3, z3, K)
    z3 = M.modadd(z3, z3, K)  # 8y^2
    t1 = M.mm(y, z, K)
    t2 = M.mm(b3, M.mm(z, z, K), K)
    x3 = M.mm(t2, z3, K)
    y3 = M.modadd(t0, t2, K)
    z3 = M.mm(t1, z3, K)
    t2 = M.triple(t2, K)
    t0 = M.modsub(t0, t2, K)
    y3 = M.modadd(M.mm(t0, y3, K), x3, K)
    x3 = M.mm(t0, M.mm(x, y, K), K)
    x3 = M.modadd(x3, x3, K)
    return (x3, y3, z3)


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
    n = ck.K.n
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


def scan_mixed(ck: CurveK, x, y, L_blk: int = 8, interpret: bool = False):
    """Per-chunk inclusive scan of mixed adds.

    x, y: (n, L, C) i32 canonical affine limbs. Returns (Sx, Sy, Sz):
    (n, L, C) — S[:, j, c] = sum of chunk c's elements 0..j (projective).
    """
    n, L, C = x.shape
    return _scan_call(ck, L, C, _blk_of(L, L_blk), True, interpret)(x, y)


def scan_proj(ck: CurveK, x, y, z, L_blk: int = 8, interpret: bool = False):
    """Per-chunk inclusive scan of projective adds; args (n, L, C)."""
    n, L, C = x.shape
    return _scan_call(ck, L, C, _blk_of(L, L_blk), False, interpret)(x, y, z)


def _map_kernel(ck: CurveK, op: str, *refs):
    if op == "padd":
        x1, y1, z1, x2, y2, z2, ox, oy, oz = refs
        r = padd(ck, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
    else:
        x1, y1, z1, ox, oy, oz = refs
        r = pdouble(ck, (x1[:], y1[:], z1[:]))
    ox[:] = r[0]
    oy[:] = r[1]
    oz[:] = r[2]


@lru_cache(maxsize=64)
def _map_call(ck: CurveK, C: int, op: str, interpret: bool):
    n = ck.K.n
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
    )

    def run(*coords):
        shaped = tuple(c.reshape(n, Ct, sub, 128) for c in coords)
        out = call(*shaped)
        return tuple(o.reshape(n, C) for o in out)

    return run


def map_padd(ck: CurveK, p, q, interpret: bool = False):
    """Pointwise complete add of two (n, C) projective point batches."""
    C = p[0].shape[-1]
    return _map_call(ck, C, "padd", interpret)(*p, *q)


def map_pdouble(ck: CurveK, p, interpret: bool = False):
    C = p[0].shape[-1]
    return _map_call(ck, C, "pdouble", interpret)(*p)

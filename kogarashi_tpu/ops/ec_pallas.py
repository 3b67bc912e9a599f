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


@dataclass(frozen=True)
class CurveK:
    """Static curve constants for the kernels (base field + b3, Montgomery
    R' = 2^260 form, scalar literals only)."""

    name: str
    K: MontConsts
    b3_t: tuple

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
    """Complete mixed add acc(projective, coords < 4p) + (x2, y2, 1) with
    x2, y2 canonical (<= p): RCB16 Alg 8, a=0. 13 Montgomery muls.
    Output coords < 3.76p."""
    K = ck.K
    b3 = M._rows(ck.b3_t, acc[0].shape[1:])
    x1, y1, z1 = acc
    t0 = M.mm(x1, x2, K)                      # [1.76]
    t1 = M.mm(y1, y2, K)                      # [1.76]
    s1 = M.modadd(x1, y1)                     # [<8]  (tight: 4p + 4p)
    s2 = M.modadd(x2, y2)                     # [2]
    t3 = M.mm(s2, s1, K)                      # [1.76]
    t3 = M.modsub2(t3, t0, t1, K, 2, 2)       # [5.76] = x1y2 + x2y1
    t4 = M.modadd(M.mm(z1, y2, K), y1)        # [5.76] = y1 + y2 z1
    t5 = M.modadd(M.mm(z1, x2, K), x1)        # [5.76] = x1 + x2 z1
    t6 = M.modadd3(t0, t0, t0)                # [5.28] = 3 x1 x2
    t2 = M.mm(b3, z1, K)                      # [1.76] = b3 z1 (z2 = 1)
    zz = M.modadd(t1, t2)                     # [3.52]
    tt = M.modsub(t1, t2, K, 2)               # [3.76]
    y5 = M.mm(b3, t5, K)                      # [1.76]
    x3 = M.modsub(M.mm(t3, tt, K), M.mm(t4, y5, K), K, 2)   # [3.76]
    y3 = M.modadd(M.mm(y5, t6, K), M.mm(tt, zz, K))         # [3.52]
    z3 = M.modadd(M.mm(zz, t4, K), M.mm(t6, t3, K))         # [3.52]
    return (x3, y3, z3)


def padd(ck: CurveK, p, q):
    """Complete projective add (both coord sets < 4p): RCB16 Alg 7, a=0.
    14 Montgomery muls. Output coords < 3.76p."""
    K = ck.K
    b3 = M._rows(ck.b3_t, p[0].shape[1:])
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = M.mm(x1, x2, K)                      # [1.76]
    t1 = M.mm(y1, y2, K)                      # [1.76]
    t2 = M.mm(z1, z2, K)                      # [1.76]
    t3 = M.mm(M.modadd(x1, y1), M.modadd(x2, y2), K)        # [<8],[<8] -> [1.76]
    t3 = M.modsub2(t3, t0, t1, K, 2, 2)       # [5.76]
    t4 = M.mm(M.modadd(y1, z1), M.modadd(y2, z2), K)
    t4 = M.modsub2(t4, t1, t2, K, 2, 2)       # [5.76]
    t5 = M.mm(M.modadd(x1, z1), M.modadd(x2, z2), K)
    t5 = M.modsub2(t5, t0, t2, K, 2, 2)       # [5.76]
    t6 = M.modadd3(t0, t0, t0)                # [5.28]
    t2b3 = M.mm(b3, t2, K)                    # [1.76]
    zz = M.modadd(t1, t2b3)                   # [3.52]
    tt = M.modsub(t1, t2b3, K, 2)             # [3.76]
    y5 = M.mm(b3, t5, K)                      # [1.76]
    x3 = M.modsub(M.mm(t3, tt, K), M.mm(t4, y5, K), K, 2)   # [3.76]
    y3 = M.modadd(M.mm(y5, t6, K), M.mm(tt, zz, K))         # [3.52]
    z3 = M.modadd(M.mm(zz, t4, K), M.mm(t6, t3, K))         # [3.52]
    return (x3, y3, z3)


def pdouble(ck: CurveK, p):
    """Complete projective doubling (coords < 4p): RCB16 Alg 9, a=0.
    5 muls + 2 squares. Output coords < 4p (y3 via one exact cond-subtract)."""
    K = ck.K
    b3 = M._rows(ck.b3_t, p[0].shape[1:])
    x, y, z = p
    t0 = M.sqr(y, K)                          # [1.76]
    t0q = M.modadd(M.modadd(t0, t0), M.modadd(t0, t0))      # [7.04] = 4y^2
    t1 = M.mm(y, z, K)                        # [1.76]
    t2 = M.mm(b3, M.sqr(z, K), K)             # [1.76]
    x3h = M.mm(t2, t0q, K)                    # [1.76] = t2 * 4y^2
    y3 = M.modadd(t0, t2)                     # [3.52]
    z3 = M.modadd(*(M.mm(t1, t0q, K),) * 2)   # [3.52] = t1 * 8y^2
    t2t = M.modadd3(t2, t2, t2)               # [5.28]
    t0s = M.modsub(t0, t2t, K, 6)             # [7.76]
    # y3 = t0s*y3 + 2*x3h: [1.76 + 3.52] = [5.28]; one exact -2p brings <3.28
    y3 = M.modadd3(M.mm(t0s, y3, K), x3h, x3h)
    y3 = M.cond_sub(y3, K, 2)                 # [3.28]
    x3 = M.modadd(*(M.mm(t0s, M.mm(x, y, K), K),) * 2)      # [3.52]
    return (x3, y3, z3)


def pneg(ck: CurveK, p):
    """(x, -y, z); y < 4p -> 4p - y <= 4p (still a valid <4p-class input:
    equality only when y == 0 mod p, and every consumer bound has slack)."""
    return (p[0], M.neg(p[1], ck.K, 4), p[2])


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


def map_padd(ck: CurveK, p, q, mode: str = "pallas"):
    """Pointwise complete add of two (n, C) projective point batches."""
    if mode == "xla":
        return _padd_jit(ck)(p, q)
    C = p[0].shape[-1]
    return _map_call(ck, C, "padd", mode == "interpret")(*p, *q)


def map_pdouble(ck: CurveK, p, mode: str = "pallas"):
    if mode == "xla":
        return _pdouble_jit(ck)(p)
    C = p[0].shape[-1]
    return _map_call(ck, C, "pdouble", mode == "interpret")(*p)

"""Device-side conversion between the 16-bit XLA field layout (fields/mont.py,
Montgomery R = 2^256) and the 13-bit Pallas engine layout (fields/mont_pallas,
Montgomery R' = 2^260).

Used to hand CRS query points produced by the device setup pipeline to the
Pallas MSM without a host round trip: projective 16-bit points -> batched
affine (one Fermat-inverse chain) -> 13-bit repack -> one mm13 by 2^264
(raises the Montgomery radix: v*2^256 * 2^264 * 2^-260 = v*2^260) ->
element-major rows.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import point as P
from ..fields import mont_pallas as M

I32 = jnp.int32
U32 = jnp.uint32


def repack16to13(a16):
    """(16, n) u32 16-bit limbs -> (20, n) i32 13-bit limbs (same value)."""
    a = a16.astype(U32)
    rows = []
    for j in range(20):
        bit = 13 * j
        b0, s = bit // 16, bit % 16
        v = a[b0] >> s
        if s + 13 > 16 and b0 + 1 < 16:
            v = v | (a[b0 + 1] << (16 - s))
        rows.append((v & U32(0x1FFF)).astype(I32))
    return jnp.stack(rows)


def repack13to16(a13):
    """(20, n) i32 13-bit limbs -> (16, n) u32 16-bit limbs (same value)."""
    a = a13.astype(U32)
    rows = []
    for j in range(16):
        bit = 16 * j
        b0, s = bit // 13, bit % 13
        v = a[b0] >> s
        have = 13 - s
        if b0 + 1 < 20:
            v = v | (a[b0 + 1] << have)
            have += 13
        if have < 16 and b0 + 2 < 20:
            v = v | (a[b0 + 2] << have)
        rows.append(v & U32(0xFFFF))
    return jnp.stack(rows)


@lru_cache(maxsize=8)
def _to_rows_jit(curve_name: str):
    from ..curves import G1, G2, GRUMPKIN
    from .msm_pallas import curve_k

    curve = {"g1": G1, "g2": G2, "grumpkin": GRUMPKIN}[curve_name]
    ck = curve_k(curve)
    # radix-raise constant: 2^264 mod p in 13-bit Montgomery strict limbs
    c_limbs = M.limbs13((1 << 264) % ck.K.p, ck.K.n)

    def conv_coord(a16):
        cst = jnp.asarray(np.array(c_limbs, np.int32)).reshape(20, 1)
        # mm output is < 1.76p; one conditional subtract restores the
        # canonical (< p) form the MSM driver's bound proofs require
        if ck.ext == 1:
            return M.cond_sub(M.mm(repack16to13(a16), cst, ck.K), ck.K, 1).T
        comps = [
            M.cond_sub(M.mm(repack16to13(a16[e]), cst, ck.K), ck.K, 1)
            for e in range(ck.ext)
        ]
        return jnp.concatenate(comps).T  # (n, ext*20)

    def run(pt):
        ax, ay, inf = P.to_affine(curve.cfg, pt)  # 16-bit, R=2^256
        return conv_coord(ax), conv_coord(ay), inf

    return jax.jit(run)


def g1_queries_to_rows(curve, pts_projective):
    """Device projective 16-bit point batch -> (x_rows, y_rows, inf, gen_xy)
    in the Pallas MSM input format (G1/Grumpkin ext=1 and G2 ext=2)."""
    x_rows, y_rows, inf = _to_rows_jit(curve.cfg.name)(pts_projective)
    g = curve.pyref_spec.generator
    p, R = curve.cfg.alg.spec.p, 1 << 260

    def pack(v):
        comps = [v.v] if not hasattr(v, "c0") else [v.c0.v, v.c1.v]
        return np.concatenate(
            [np.array(M.limbs13((cv * R) % p, 20), np.int32) for cv in comps]
        )

    gen_xy = (pack(g.x), pack(g.y))
    return x_rows, y_rows, inf, gen_xy

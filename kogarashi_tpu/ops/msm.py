"""Multi-scalar multiplication (Pippenger) — TPU-shaped.

The reference's Pippenger (groth16/src/msm.rs) scatters points into buckets
with data-dependent indices and rayon-parallel windows. TPUs want uniform
control flow, so bucket accumulation is reformulated around sorting and
prefix sums (EC negation is free, so segment sums are differences of an
unsegmented scan):

  per window w (lax.scan over windows — one traced body):
    1. digits  = c-bit window of each scalar              (vector ops)
    2. perm    = argsort(digits)                          (XLA sort)
    3. S       = inclusive prefix-scan of permuted points
                 under EC addition (chunked grid scan,
                 ~2n adds, wide batches, tiny trace)      (ops/pscan.py)
    4. bucket_j = S[tail(j)] - S[before(j)]               (2 data scatters + 1 add)
    5. G_w     = sum_j j*bucket_j via reverse suffix scan
                 + reduction over buckets                 (batched adds)
  combine: total = sum_w 2^(c*w) G_w (MSB-first: c doublings + 1 add / window)

Everything is batched EC arithmetic over limb-major arrays; gather/scatter
moves only *data*, never computation. Scalars arrive as standard-form limbs
(16, n) uint32; points as a batched projective pytree.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..curves import point as P
from ..curves.point import CurveCfg
from .pscan import prefix_scan, reduce_all

U32 = jnp.uint32


def default_window(n: int) -> int:
    """Window size heuristic (reference: msm.rs:7-14 ln-based; tuned for the
    sort/scan formulation where window count drives total adds)."""
    if n < (1 << 10):
        return 8
    if n < (1 << 16):
        return 12
    return 16


def _gather_point(pt, idx):
    """Gather batched point columns by index array (last axis = batch)."""
    return tuple(jnp.take(c, idx, axis=-1) for c in pt)


def _scatter_point(dst, idx, src):
    """dst.at[..., idx] <- src columns; out-of-range idx dropped."""
    return tuple(d.at[..., idx].set(s, mode="drop") for d, s in zip(dst, src))


def _digits(scalars_padded, w, c: int):
    """Extract c-bit window w from (17, n) standard-form limbs (traced w)."""
    bitpos = w * c
    limb = bitpos // 16
    shift = bitpos % 16
    lo = jnp.take(scalars_padded, limb, axis=0)
    hi = jnp.take(scalars_padded, limb + 1, axis=0)
    d = (lo >> shift) | jnp.where(shift == 0, U32(0), hi << (16 - shift))
    return d & U32((1 << c) - 1)


def msm(cfg: CurveCfg, points, scalars, c: int | None = None):
    """sum_i scalars[i] * points[i].

    points: batched projective pytree (coords (..., 16, n));
    scalars: (16, n) uint32 standard-form limbs. Returns a batch-() point.
    """
    n = scalars.shape[-1]
    if c is None:
        c = default_window(n)
    n_windows = -(-256 // c)
    n_buckets = 1 << c

    scal_pad = jnp.concatenate([scalars, jnp.zeros((1, n), U32)])
    combine = lambda a, b: P.padd(cfg, a, b)
    ident = lambda k: P.identity(cfg, (k,))

    def window_body(_, w):
        d = _digits(scal_pad, w, c)
        perm = jnp.argsort(d)
        ds = jnp.take(d, perm, axis=0)
        pts = _gather_point(points, perm)
        S = prefix_scan(combine, ident, pts)

        is_tail = jnp.concatenate([ds[:-1] != ds[1:], jnp.ones((1,), bool)])
        is_start = jnp.concatenate([jnp.ones((1,), bool), ds[:-1] != ds[1:]])
        oob = U32(n_buckets)
        tail_idx = jnp.where(is_tail & (ds != 0), ds, oob)
        start_idx = jnp.where(is_start & (ds != 0), ds, oob)

        id_buckets = P.identity(cfg, (n_buckets,))
        bucket_tail = _scatter_point(id_buckets, tail_idx, S)
        # prefix value just before each segment start (identity at position 0)
        id1 = P.identity(cfg, (1,))
        S_prev = tuple(
            jnp.concatenate([i, s[..., :-1]], axis=-1) for s, i in zip(S, id1)
        )
        bucket_before = _scatter_point(id_buckets, start_idx, S_prev)
        buckets = P.padd(cfg, bucket_tail, P.pneg(cfg, bucket_before))

        # G_w = sum_{j>=1} j*B_j = sum of suffix sums T_j = sum_{k>=j} B_k
        T = prefix_scan(combine, ident, buckets, reverse=True)
        T1 = tuple(t[..., 1:] for t in T)
        g = reduce_all(combine, ident, T1)
        return None, g

    _, Gs = jax.lax.scan(window_body, None, jnp.arange(n_windows, dtype=U32))
    # Gs: pytree with leading window axis; combine MSB-first
    Gs_rev = tuple(g[::-1] for g in Gs)

    def combine_w(acc, g):
        acc = jax.lax.fori_loop(0, c, lambda _, a: P.pdouble(cfg, a), acc)
        return P.padd(cfg, acc, g), None

    total, _ = jax.lax.scan(combine_w, P.identity(cfg, ()), Gs_rev)
    return total


_JIT_CACHE: dict = {}


def msm_jit(cfg: CurveCfg, c: int | None = None):
    """Process-cached jitted MSM for (curve, window) — same-shape calls share
    one compile."""
    key = (cfg.name, c)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(partial(msm, cfg, c=c))
    return _JIT_CACHE[key]

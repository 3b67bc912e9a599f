"""Pippenger MSM on fused Pallas kernels — the flagship TPU kernel.

Pipeline (per c-bit signed window; reference algorithm: groth16/src/msm.rs:6-91,
reformulated for uniform SIMD control flow):

  1. signed digit recode (halves the bucket count; EC negation is free)
  2. payload-carrying sort: the points ride through `lax.sort` as packed
     u32 columns (two 13-bit limbs per word), so sorting IS the data
     movement — measured ~9 ms/window at 2^20 vs 45-70 ms for the
     index-sort + row-gather formulation it replaced
  3. unpack sorted columns into the (limb, scan-pos, chunk) scan layout
  4. `scan_mixed` Pallas kernel: per-chunk inclusive prefix sums under mixed
     EC addition — n point-adds, all limb math in VMEM (ops/ec_pallas.py)
  5. chunk totals -> recursive `scan_proj` prefix (the cross-chunk offsets)
  6. bucket_b = S[tail_b] - S[start_b - 1]  (difference trick: every scanned
     element is a valid group element, so per-segment differences are exact)
  7. G_w = sum_b b * bucket_b via suffix prefix + reduction
  8. combine windows MSB-first (c fused doublings + 1 add per window)

Identity inputs are replaced by the curve generator with digit 0 — bucket 0 is
never consumed, and keeping every lane a valid group element is what makes the
difference trick sound.

Input format: element-major affine rows (n, rows) int32 limbs in the
engine's 13-bit Montgomery form (R' = 2^260; see fields/mont_pallas.py) with
rows = 20 for G1/Grumpkin and 40 (c0 then c1) for G2, an (n,) infinity mask,
and (16, n) uint32 standard-form scalars (16-bit limbs; only digit
extraction reads them). The whole pipeline is generic over the coefficient
algebra (ec_pallas.CurveK.ext).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont_pallas as M
from ..fields.spec import LIMB_BITS
from . import ec_pallas as E
from .ec_pallas import CurveK

I32 = jnp.int32
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# layout: scan arrays are (n_limbs, L, C); element s of the batch is chunk
# c = s // L, position j = s % L, i.e. consecutive elements share a chunk.
# ---------------------------------------------------------------------------


def _to_scan(x, L, C):
    """(n, L*C) element-major -> (n, L, C) scan layout."""
    return jnp.swapaxes(x.reshape(x.shape[0], C, L), 1, 2)


def _from_scan(S):
    """(n, L, C) -> (n, L*C) element-major."""
    return jnp.swapaxes(S, 1, 2).reshape(S.shape[0], -1)


def _pad_points(ck: CurveK, pts, m_to: int):
    m = pts[0].shape[-1]
    if m == m_to:
        return pts
    ident = E.identity_tile(ck, (m_to - m,))
    return tuple(jnp.concatenate([c, i], axis=-1) for c, i in zip(pts, ident))


def _level_shape(m: int):
    C = 1024 if m >= 8 * 1024 else 128
    return -(-m // C), C


def _kogge_prefix(ck: CurveK, pts, mode: str):
    """Inclusive prefix over <= 128 points via shift-and-add (7 map_padd)."""
    m = pts[0].shape[-1]
    cur = _pad_points(ck, pts, 128)
    shift = 1
    while shift < 128:
        ident = E.identity_tile(ck, (shift,))
        shifted = tuple(
            jnp.concatenate([i, c[..., :-shift]], axis=-1)
            for c, i in zip(cur, ident)
        )
        cur = E.map_padd(ck, cur, shifted, mode=mode)
        shift *= 2
    return tuple(c[..., :m] for c in cur)


def inclusive_prefix(ck: CurveK, pts, mode: str = "pallas"):
    """Inclusive prefix sums of a projective batch (n, m) -> same shape."""
    m = pts[0].shape[-1]
    if m <= 128:
        return _kogge_prefix(ck, pts, mode)
    L, C = _level_shape(m)
    pts_p = _pad_points(ck, pts, L * C)
    arr = tuple(_to_scan(c, L, C) for c in pts_p)
    S = E.scan_proj(ck, *arr, mode=mode)
    totals = tuple(c[:, L - 1, :] for c in S)  # per-chunk sums, chunk order
    tp = inclusive_prefix(ck, totals, mode=mode)
    ident1 = E.identity_tile(ck, (1,))
    tpe = tuple(  # exclusive chunk offsets
        jnp.concatenate([i, c[..., :-1]], axis=-1) for c, i in zip(tp, ident1)
    )
    S_elem = tuple(_from_scan(c) for c in S)
    off = tuple(
        jnp.repeat(c, L, axis=-1, total_repeat_length=L * C) for c in tpe
    )
    out = E.map_padd(ck, S_elem, off, mode=mode)
    return tuple(c[..., :m] for c in out)


def reduce_points(ck: CurveK, pts, mode: str = "pallas"):
    """Total sum of a projective batch (n, m) -> (n, 1)."""
    m = pts[0].shape[-1]
    while m > 128:
        L, C = _level_shape(m)
        pts = _pad_points(ck, pts, L * C)
        arr = tuple(_to_scan(c, L, C) for c in pts)
        S = E.scan_proj(ck, *arr, mode=mode)
        pts = tuple(c[:, L - 1, :] for c in S)
        m = C
    out = _kogge_prefix(ck, pts, mode)
    return tuple(c[..., m - 1 : m] for c in out)


# ---------------------------------------------------------------------------
# signed digit recode
# ---------------------------------------------------------------------------


def signed_digits(scalars, c: int, n_windows: int):
    """Standard-form scalar limbs (16, n) u32 -> (n_windows, n) i32 in
    [-2^(c-1), 2^(c-1)].

    d_w + carry chain satisfies sum_w d_w 2^(cw) == scalar. Requires the top
    window to absorb the final carry (true for BN254-size scalars:
    scalar < 2^254 and c*(n_windows-1) >= 254 - c + 1)."""
    n = scalars.shape[-1]
    scal_pad = jnp.concatenate([scalars, jnp.zeros((2, n), U32)]).astype(U32)
    carry = jnp.zeros((n,), I32)
    half = 1 << (c - 1)
    out = []
    for w in range(n_windows):
        bitpos = w * c
        limb, shift = bitpos // LIMB_BITS, bitpos % LIMB_BITS
        raw = scal_pad[limb] >> shift
        if shift:
            raw = raw | (scal_pad[limb + 1] << (LIMB_BITS - shift))
            if c + shift > 2 * LIMB_BITS:
                raw = raw | (scal_pad[limb + 2] << (2 * LIMB_BITS - shift))
        elif c > LIMB_BITS:
            raw = raw | (scal_pad[limb + 1] << LIMB_BITS)
        raw = (raw & U32((1 << c) - 1)).astype(I32)
        t = raw + carry
        sign = (t >= half) & (w + 1 < n_windows)
        d = jnp.where(sign, t - (1 << c), t)
        carry = sign.astype(I32)
        out.append(d)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------


def _neg_affine_y(y_rows, ck: CurveK):
    """Canonical (m, rows) y rows -> (p - y), exact, componentwise for Fq2,
    staying canonical (y == 0 maps to p, which the bound proofs absorb)."""
    m = y_rows.shape[0]
    nl = ck.K.n
    comp = y_rows.reshape(m, ck.ext, nl)
    p_rows = jnp.asarray(np.array(M.limbs13(ck.K.p, nl), np.int32))[None, None]
    d = p_rows - comp
    out, carry = [], jnp.zeros(d.shape[:-1], I32)
    for k in range(nl):
        t = d[..., k] + carry
        out.append(t & I32(M.WMASK))
        carry = t >> M.W
    res = jnp.stack(out, axis=-1)
    # a zero component must stay zero, not become p (p-0 = p is fine for the
    # bound proofs, but for Fq2 a zero c1 component must remain a valid
    # encoding of -y; p == 0 mod p either way, so keep it simple and exact)
    return res.reshape(m, ck.ext * nl)


def default_window(n: int) -> int:
    """Window heuristic: bucket-phase work (~3 * 2^(c-1) adds/window) should
    stay well under the n scan adds (reference heuristic: msm.rs:7-14)."""
    if n < (1 << 10):
        return 8
    if n < (1 << 16):
        return 12
    return 16


def _pick_L(n: int) -> int:
    """Scan depth: n = L * C with C a multiple of full tiles (1024 lanes
    when possible); favour deep scans (fewer cross-chunk totals)."""
    grain = 1024 if n % 1024 == 0 else 128
    for L in (128, 64, 32, 16, 8, 4, 2, 1):
        if n % (L * grain) == 0 and n // L >= grain:
            return L
    return 1


def msm_pallas(
    ck: CurveK,
    x_rows,
    y_rows,
    inf,
    scalars,
    c: int | None = None,
    gen_xy=None,
    mode: str = "pallas",
    scan_windows: bool = False,
):
    """sum_i scalars[i] * P_i on one chip.

    x_rows, y_rows: (n, 20) i32 element-major 13-bit Montgomery affine coords;
    inf: (n,) bool; scalars: (16, n) u32 standard-form; gen_xy: host tuple of
    the generator's limb rows (identity replacement). Returns a projective
    point: three (20, 1) i32 arrays with coords < 4p (13-bit Montgomery)."""
    nl = ck.rows
    n = x_rows.shape[0]
    if c is None:
        c = default_window(n)
    # pad with identity rows (zero scalars) so n = L * C with C a multiple
    # of full (8, 128) VPU tiles and L the deepest fitting scan, keeping
    # waste under ~6%
    quantum = 128
    for Lq in (128, 64, 32, 16, 8, 4, 2, 1):
        q = Lq * 1024
        if (-n) % q <= max(n // 16, 128) and (n + (-n) % q) // Lq >= 1024:
            quantum = q
            break
    if n % quantum:
        pad = quantum - n % quantum
        x_rows = jnp.concatenate([x_rows, jnp.zeros((pad, nl), I32)])
        y_rows = jnp.concatenate([y_rows, jnp.zeros((pad, nl), I32)])
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)])
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((scalars.shape[0], pad), U32)], axis=1
        )
        n += pad
    n_windows = -(-256 // c)
    nb = (1 << (c - 1)) + 1  # signed digits: |d| in [0, 2^(c-1)]
    nbp = -(-nb // 128) * 128
    L = _pick_L(n)
    C = n // L

    # identity inputs -> generator with zero scalar
    gx, gy = gen_xy
    x_rows = jnp.where(inf[:, None], jnp.asarray(gx, I32)[None], x_rows)
    y_rows = jnp.where(inf[:, None], jnp.asarray(gy, I32)[None], y_rows)
    scalars = scalars * (~inf).astype(U32)[None]

    digits = signed_digits(scalars, c, n_windows)  # (w, n) i32
    iota = jax.lax.broadcasted_iota(I32, (n, 1), 0)[:, 0]

    # Pack each point into nl u32 payload columns (two 13-bit limbs per word:
    # x in cols [0, nl/2), y in [nl/2, nl)); the per-window sort CARRIES the
    # payload to sorted positions. Measured on-chip, a 21-column payload sort
    # costs ~9 ms at 2^20 vs ~45-70 ms for an XLA row gather — this removes
    # the gather (the dominant per-window cost) entirely.
    xu = x_rows.astype(U32)
    yu = y_rows.astype(U32)
    pay = [xu[:, 2 * i] | (xu[:, 2 * i + 1] << 13) for i in range(nl // 2)]
    pay += [yu[:, 2 * i] | (yu[:, 2 * i + 1] << 13) for i in range(nl // 2)]

    def window_body(_, d):
        key = jnp.abs(d).astype(U32)
        sign = (d < 0).astype(U32)
        out = jax.lax.sort((key, sign, *pay), num_keys=1)
        ds, sg = out[0], out[1].astype(bool)
        cols = out[2:]

        def unpack(cols_half):
            limbs = []
            for cw in cols_half:
                limbs.append((cw & U32(0x1FFF)).astype(I32))
                limbs.append((cw >> 13).astype(I32))
            # (nl, n) element order -> (nl, L, C) scan layout
            return jnp.swapaxes(
                jnp.stack(limbs).reshape(nl, C, L), 1, 2
            )

        xg = unpack(cols[: nl // 2])
        yg_rows = jnp.stack(
            [
                (cols[nl // 2 + i // 2] >> (13 * (i % 2))) & U32(0x1FFF)
                for i in range(nl)
            ],
            axis=-1,
        ).astype(I32)  # (n, nl) element-major, sorted order
        yg_rows = jnp.where(sg[:, None], _neg_affine_y(yg_rows, ck), yg_rows)
        yg = jnp.swapaxes(jnp.transpose(yg_rows).reshape(nl, C, L), 1, 2)

        S = E.scan_mixed(ck, xg, yg, L_blk=8, mode=mode)
        totals = tuple(s[:, L - 1, :] for s in S)
        tp = inclusive_prefix(ck, totals, mode=mode)  # (nl, C)
        ident1 = E.identity_tile(ck, (1,))
        tpe = tuple(
            jnp.concatenate([i, t[..., :-1]], axis=-1)
            for t, i in zip(tp, ident1)
        )

        # bucket endpoints in sorted order
        ds_i = ds.astype(I32)
        nxt = jnp.concatenate([ds_i[1:], jnp.full((1,), -1, I32)])
        prv = jnp.concatenate([jnp.full((1,), -1, I32), ds_i[:-1]])
        is_tail = (ds_i != nxt) & (ds_i > 0)
        is_start = (ds_i != prv) & (ds_i > 0)
        tail_pos = (
            jnp.full((nbp,), -1, I32)
            .at[jnp.where(is_tail, ds_i, nbp)]  # nbp out of range -> dropped
            .set(iota, mode="drop")
        )
        start_pos = (
            jnp.full((nbp,), -1, I32)
            .at[jnp.where(is_start, ds_i, nbp)]
            .set(iota, mode="drop")
        )
        have = tail_pos >= 0

        def gather_S(pos):
            """Global prefix at sorted position `pos` ((nbp,) i32, -1 -> id)."""
            pc = jnp.clip(pos, 0, n - 1)
            cc, jj = pc // L, pc % L
            flat = jj * C + cc
            vals = tuple(
                jnp.take(s.reshape(nl, L * C), flat, axis=-1) for s in S
            )
            offs = tuple(jnp.take(t, cc, axis=-1) for t in tpe)
            glob = E.map_padd(ck, vals, offs, mode=mode)
            idp = E.identity_tile(ck, (nbp,))
            ok = pos >= 0
            return tuple(jnp.where(ok[None], g, i) for g, i in zip(glob, idp))

        S_tail = gather_S(tail_pos)
        S_before = gather_S(start_pos - 1)
        B = E.map_padd(
            ck,
            S_tail,
            (S_before[0], ck.alg.neg(S_before[1], 4), S_before[2]),
            mode=mode,
        )
        idp = E.identity_tile(ck, (nbp,))
        B = tuple(jnp.where(have[None], b, i) for b, i in zip(B, idp))

        # G_w = sum_b b*B_b = sum of suffix sums over b >= 1
        Brev = tuple(b[..., ::-1] for b in B)
        Trev = inclusive_prefix(ck, Brev, mode=mode)
        T = tuple(t[..., ::-1] for t in Trev)
        tot = reduce_points(ck, T, mode=mode)  # includes T_0
        T0 = tuple(t[..., 0:1] for t in T)
        G_w = E.map_padd(
            ck,
            _pad_points(ck, tot, 128),
            _pad_points(ck, (T0[0], ck.alg.neg(T0[1], 4), T0[2]), 128),
            mode=mode,
        )
        return None, tuple(g[..., 0:1] for g in G_w)

    # one traced window body (lax.scan) instead of n_windows unrolled copies:
    # same kernels, ~n_windows-times faster XLA compiles. The xla executor
    # joins this path when the caller asks for it (scan_windows=True — the
    # traced/shard_map contexts, where a python loop would unroll n_windows
    # copies into one giant program); eagerly it keeps the python loop so
    # each small kernel jit stays individually cached. True-interpret always
    # loops (pallas interpret kernels don't nest under scan).
    if mode == "pallas" or (scan_windows and mode == "xla"):
        _, Gs_st = jax.lax.scan(window_body, None, digits)
        Gs = [tuple(g[w] for g in Gs_st) for w in range(n_windows)]
    else:
        Gs = [window_body(None, digits[w])[1] for w in range(n_windows)]

    # MSB-first combine: acc = 2^c * acc + G_w (c doublings fused per kernel)
    acc = _pad_points(ck, Gs[-1], 128)
    for w in range(n_windows - 2, -1, -1):
        acc = E.map_pdouble(ck, acc, mode=mode, times=c)
        acc = E.map_padd(ck, acc, _pad_points(ck, Gs[w], 128), mode=mode)
    return tuple(a[..., 0:1] for a in acc)


# ---------------------------------------------------------------------------
# host-side input preparation / output decoding
# ---------------------------------------------------------------------------


def _pack13(vals, nl: int) -> np.ndarray:
    """List of ints (< 2^260) -> (m, nl) int32 rows of 13-bit limbs."""
    out = np.empty((len(vals), nl), np.int32)
    for r, v in enumerate(vals):
        v = int(v)
        for i in range(nl):
            out[r, i] = (v >> (M.W * i)) & M.WMASK
    return out


def _coord_vals(v, ext):
    """pyref field element -> list of `ext` int components."""
    if ext == 1:
        return [v.v]
    return [v.c0.v, v.c1.v]


def _pack_coord(vals_per_pt, p, R, nl, ext):
    """Per-point component lists -> (m, ext*nl) rows."""
    flat = [((c * R) % p) for comps in vals_per_pt for c in comps]
    return _pack13(flat, nl).reshape(len(vals_per_pt), ext * nl)


def prepare_points(curve, pts):
    """pyref affine points -> (x_rows, y_rows, inf, gen_xy) device arrays
    (13-bit limbs, Montgomery R' = 2^260). Supports G1/Grumpkin (ext=1) and
    G2 (ext=2: rows are c0 limbs then c1 limbs)."""
    ck = curve_k(curve)
    p, R, nl, ext = ck.K.p, ck.K.mont_r, ck.K.n, ck.ext
    zero = [0] * ext
    xs = _pack_coord(
        [zero if q.is_infinity else _coord_vals(q.x, ext) for q in pts], p, R, nl, ext
    )
    ys = _pack_coord(
        [zero if q.is_infinity else _coord_vals(q.y, ext) for q in pts], p, R, nl, ext
    )
    inf = np.array([q.is_infinity for q in pts], dtype=bool)
    g = curve.pyref_spec.generator
    gen_xy = (
        _pack_coord([_coord_vals(g.x, ext)], p, R, nl, ext)[0],
        _pack_coord([_coord_vals(g.y, ext)], p, R, nl, ext)[0],
    )
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(inf), gen_xy


def decode_point(curve, out):
    """(x, y, z) three (rows, m) i32 13-bit Montgomery projective coords ->
    list of pyref affine points (host math, exact)."""
    ck = curve_k(curve)
    p, Rinv, nl = ck.K.p, pow(ck.K.mont_r, -1, ck.K.p), ck.K.n
    arrs = [np.asarray(c) for c in out]
    m = arrs[0].shape[-1]
    res = []
    spec = curve.pyref_spec
    Aff = type(spec.generator)

    def dec(a, j):
        comps = [
            M.limbs13_to_int(a[e * nl : (e + 1) * nl, j]) * Rinv % p
            for e in range(ck.ext)
        ]
        if ck.ext == 1:
            return spec.field(comps[0])
        from ..pyref import Fq, Fq2

        return Fq2(Fq(comps[0]), Fq(comps[1]))

    for j in range(m):
        x, y, z = (dec(a, j) for a in arrs)
        if z.is_zero():
            res.append(spec.identity_affine())
        else:
            zi = z.invert()
            res.append(Aff(spec, x * zi, y * zi, False))
    return res


def curve_k(curve) -> CurveK:
    """CurveK for one of the kogarashi_tpu.curves Curve instances."""
    alg = curve.cfg.alg
    b3 = curve.cfg.b3 if alg.ext_degree == 1 else tuple(curve.cfg.b3)
    return CurveK.make(curve.cfg.name, alg.spec, b3)

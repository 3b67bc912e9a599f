"""Pallas MSM engine vs the pyref oracle, CPU interpret mode.

Covers every kernel layer: 13-bit Montgomery limb ops (fields/mont_pallas),
EC formulas + scan/map kernels (ops/ec_pallas), and the full Pippenger driver
(ops/msm_pallas) at several (n, c) shapes including identity points, repeated
points, zero/duplicate digits and both G1 and Grumpkin."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves import G1, GRUMPKIN
from kogarashi_tpu.fields.spec import FQ, ints_to_limbs
from kogarashi_tpu.fields import mont_pallas as M
from kogarashi_tpu.ops import ec_pallas as E
from kogarashi_tpu.ops.msm_pallas import (
    curve_k,
    decode_point,
    msm_pallas,
    prepare_points,
    signed_digits,
)

K = M.MontConsts.make(FQ)
P = K.p
R = K.mont_r


def enc13(vals, tile=()):
    """Ints -> (20, *tile-compatible) mont13 limbs, one column per value."""
    arr = np.zeros((K.n, len(vals)), np.int32)
    for j, v in enumerate(vals):
        for i, l in enumerate(M.limbs13((v * R) % P, K.n)):
            arr[i, j] = l
    return jnp.asarray(arr)


def dec13(arr):
    a = np.asarray(arr)
    rinv = pow(R, -1, P)
    return [
        M.limbs13_to_int(a[:, j]) * rinv % P for j in range(a.shape[-1])
    ]


def test_mm_sqr_addsub_bounds(rng):
    vals_a = [rng.randrange(P) for _ in range(32)]
    vals_b = [rng.randrange(P) for _ in range(32)]
    A, B = enc13(vals_a), enc13(vals_b)
    got = dec13(jax.jit(lambda a, b: M.mm(a, b, K))(A, B))
    assert got == [a * b % P for a, b in zip(vals_a, vals_b)]
    got = dec13(jax.jit(lambda a: M.sqr(a, K))(A))
    assert got == [a * a % P for a in vals_a]
    got = dec13(jax.jit(M.modadd)(A, B))
    assert got == [(a + b) % P for a, b in zip(vals_a, vals_b)]
    got = dec13(jax.jit(lambda a, b: M.modsub(a, b, K, 2))(A, B))
    assert got == [(a - b) % P for a, b in zip(vals_a, vals_b)]


def _ec_pts(curve, ks):
    g = curve.pyref_spec.generator
    return [k * g for k in ks]


def _enc_proj(curve, pts, pad_to=128):
    """pyref affine -> three (20, pad) mont13 projective coord arrays."""
    ck = curve_k(curve)
    p, Rm, nl = ck.K.p, ck.K.mont_r, ck.K.n

    def col(v):
        return M.limbs13((v * Rm) % p, nl)

    xs = np.zeros((nl, pad_to), np.int32)
    ys = np.zeros((nl, pad_to), np.int32)
    zs = np.zeros((nl, pad_to), np.int32)
    for j in range(pad_to):
        q = pts[j % len(pts)]
        x, y, z = (0, 1, 0) if q.is_infinity else (q.x.v, q.y.v, 1)
        for i, l in enumerate(col(x)):
            xs[i, j] = l
        for i, l in enumerate(col(y)):
            ys[i, j] = l
        for i, l in enumerate(col(z)):
            zs[i, j] = l
    return tuple(jnp.asarray(a) for a in (xs, ys, zs))


def test_map_padd_pdouble_vs_pyref(rng):
    ks = [rng.randrange(C.R) for _ in range(8)] + [0]  # incl. identity
    pts = _ec_pts(G1, ks)
    pa = _enc_proj(G1, pts)
    pb = _enc_proj(G1, pts[::-1])
    ck = curve_k(G1)
    out = E.map_padd(ck, pa, pb, mode="xla")
    got = decode_point(G1, out)
    for j in range(9):
        assert got[j] == pts[j % 9] + pts[::-1][j % 9], j
    out = E.map_pdouble(ck, pa, mode="xla")
    got = decode_point(G1, out)
    for j in range(9):
        assert got[j] == pts[j % 9] + pts[j % 9], j


@pytest.mark.slow
@pytest.mark.nightly
def test_scan_mixed_vs_pyref(rng):
    """Per-chunk prefix sums: L=4, C=128 with repeated + adversarial points."""
    ck = curve_k(G1)
    n, L, Cc = 512, 4, 128
    ks = [rng.randrange(C.R) for _ in range(n // 2)]
    ks = ks + ks  # force repeats
    pts = _ec_pts(G1, ks)
    x_rows, y_rows, inf, gen = prepare_points(G1, pts)
    xg = jnp.transpose(jnp.asarray(np.asarray(x_rows)).reshape(Cc, L, ck.K.n), (2, 1, 0))
    yg = jnp.transpose(jnp.asarray(np.asarray(y_rows)).reshape(Cc, L, ck.K.n), (2, 1, 0))
    S = E.scan_mixed(ck, xg, yg, mode="xla")
    # decode all positions of a few random chunks
    for cc in [0, 7, 127]:
        acc = G1.pyref_spec.identity_affine()
        cols = tuple(s[:, :, cc] for s in S)
        got = decode_point(G1, tuple(c for c in cols))
        for j in range(L):
            acc = acc + pts[cc * L + j]
            assert got[j] == acc, (cc, j)


def _msm_oracle(pts, ks, order, curve):
    g = curve.pyref_spec.generator
    acc = curve.pyref_spec.identity_affine()
    for p, k in zip(pts, ks):
        acc = acc + (k % order) * p
    return acc


@pytest.mark.slow
@pytest.mark.parametrize(
    "curve,order,n,c",
    [
        (G1, C.R, 512, 8),  # default-run smoke case; full matrix is nightly
        pytest.param(G1, C.R, 512, 12, marks=pytest.mark.nightly),
        pytest.param(G1, C.R, 512, 13, marks=pytest.mark.nightly),
        pytest.param(G1, C.R, 512, 16, marks=pytest.mark.nightly),
        pytest.param(G1, C.R, 1024, 6, marks=pytest.mark.nightly),
        pytest.param(GRUMPKIN, C.Q, 512, 8, marks=pytest.mark.nightly),
    ],
    ids=["g1-512-c8", "g1-512-c12", "g1-512-c13", "g1-512-c16",
         "g1-1024-c6", "grumpkin-512-c8"],
)
def test_msm_pallas_vs_oracle(curve, order, n, c, rng):
    g = curve.pyref_spec.generator
    base = [rng.randrange(1, order) * g for _ in range(32)]
    pts = [base[i % 32] for i in range(n)]  # heavy repetition (adversarial)
    pts[5] = curve.pyref_spec.identity_affine()
    pts[17] = curve.pyref_spec.identity_affine()
    ks = [rng.randrange(order) for _ in range(n - 4)] + [0, 0, 1, order - 1]
    x, y, inf, gen = prepare_points(curve, pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    out = msm_pallas(curve_k(curve), x, y, inf, s, c=c, gen_xy=gen, mode="xla")
    got = decode_point(curve, out)[0]
    assert got == _msm_oracle(pts, ks, order, curve)


def test_msm_pallas_all_zero_scalars(rng):
    n = 512
    pts = _ec_pts(G1, [rng.randrange(C.R) for _ in range(n)])
    ks = [0] * n
    x, y, inf, gen = prepare_points(G1, pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    out = msm_pallas(curve_k(G1), x, y, inf, s, c=8, gen_xy=gen, mode="xla")
    assert decode_point(G1, out)[0].is_infinity


def test_signed_digits_reconstruct(rng):
    for c in (6, 8, 13, 16):
        n_windows = -(-256 // c)
        ks = [rng.randrange(C.R) for _ in range(64)] + [0, 1, C.R - 1]
        s = jnp.asarray(ints_to_limbs(ks).T)
        d = np.asarray(signed_digits(s, c, n_windows))
        for j, k in enumerate(ks):
            v = sum(int(d[w, j]) << (c * w) for w in range(n_windows))
            assert v == k, (c, j)
            assert all(abs(int(d[w, j])) <= 1 << (c - 1) for w in range(n_windows))


@pytest.mark.slow
def test_pallas_plumbing_interpret_matches_xla(rng):
    """One small true-interpret run validates the BlockSpec/grid/scratch
    plumbing of the real kernels against the pure-XLA executor."""
    ck = curve_k(G1)
    n, L, Cc = 256, 2, 128
    ks = [rng.randrange(C.R) for _ in range(n)]
    pts = _ec_pts(G1, ks)
    x_rows, y_rows, _, _ = prepare_points(G1, pts)
    xg = jnp.transpose(jnp.asarray(np.asarray(x_rows)).reshape(Cc, L, ck.K.n), (2, 1, 0))
    yg = jnp.transpose(jnp.asarray(np.asarray(y_rows)).reshape(Cc, L, ck.K.n), (2, 1, 0))
    S_int = E.scan_mixed(ck, xg, yg, mode="interpret")
    S_xla = E.scan_mixed(ck, xg, yg, mode="xla")
    # projective coords may differ only by representation; compare decoded
    a = decode_point(G1, tuple(s[:, L - 1, :8] for s in S_int))
    b = decode_point(G1, tuple(s[:, L - 1, :8] for s in S_xla))
    assert a == b


@pytest.mark.slow
@pytest.mark.nightly
def test_msm_pallas_g2(rng):
    """G2 (Fq2, ext=2) through the same driver — Karatsuba algebra layer."""
    from kogarashi_tpu.curves import G2

    n = 256
    g = G2.pyref_spec.generator
    base = [rng.randrange(1, C.R) * g for _ in range(16)]
    pts = [base[i % 16] for i in range(n)]
    pts[5] = G2.pyref_spec.identity_affine()
    ks = [rng.randrange(C.R) for _ in range(n - 2)] + [0, C.R - 1]
    x, y, inf, gen = prepare_points(G2, pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    out = msm_pallas(curve_k(G2), x, y, inf, s, c=8, gen_xy=gen, mode="xla")
    got = decode_point(G2, out)[0]
    assert got == _msm_oracle(pts, ks, C.R, G2)

"""Scratch: verify Pallas field/EC/MSM kernels on the real TPU chip.

Run: python scratch/check_pallas.py [stage]
Stages: field, ec, msm, all
"""

import sys
import time
import random

sys.path.insert(0, "/root/repo")  # PYTHONPATH breaks the axon plugin discovery

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves import G1
from kogarashi_tpu.fields import mont_pallas as M
from kogarashi_tpu.fields.spec import FQ, ints_to_limbs
from kogarashi_tpu.ops import ec_pallas as E
from kogarashi_tpu.ops import msm_pallas as MP

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
rng = random.Random(42)

INTERPRET = "--interpret" in sys.argv


def enc(vals, tile):
    """python ints -> (n, *tile) i32 Montgomery strict limbs (broadcast)."""
    spec = FQ
    R = 1 << (16 * spec.n_limbs)
    out = np.zeros((spec.n_limbs, len(vals)), np.int32)
    for i, v in enumerate(vals):
        m = (v * R) % spec.p
        for k in range(spec.n_limbs):
            out[k, i] = (m >> (16 * k)) & 0xFFFF
    return jnp.asarray(out.reshape(spec.n_limbs, *tile))


def dec(arr):
    """(n, *batch) i32 limbs (strict or lazy mont) -> python ints mod p."""
    a = np.asarray(arr, dtype=np.int64).reshape(arr.shape[0], -1)
    spec = FQ
    Rinv = pow(1 << (16 * spec.n_limbs), -1, spec.p)
    outs = []
    for col in range(a.shape[1]):
        v = sum(int(a[k, col]) << (16 * k) for k in range(a.shape[0]))
        outs.append((v * Rinv) % spec.p)
    return outs


def stage_field():
    K = M.MontConsts.make(FQ)
    tile = (8, 128)
    navals = 8 * 128
    avals = [rng.randrange(FQ.p) for _ in range(navals)]
    bvals = [rng.randrange(FQ.p) for _ in range(navals)]
    a = enc(avals, tile)
    b = enc(bvals, tile)

    def kern(a_ref, b_ref, o_mm, o_add, o_sub):
        o_mm[:] = M.mm(a_ref[:], b_ref[:], K)
        o_add[:] = M.modadd(a_ref[:], b_ref[:], K)
        o_sub[:] = M.modsub(a_ref[:], b_ref[:], K)

    out = pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((K.n, *tile), I32) for _ in range(3)),
        interpret=INTERPRET,
    )(a, b)
    got_mm = dec(out[0])
    got_add = dec(out[1])
    got_sub = dec(out[2])
    for i in range(navals):
        assert got_mm[i] == (avals[i] * bvals[i]) % FQ.p, f"mm lane {i}"
        assert got_add[i] == (avals[i] + bvals[i]) % FQ.p, f"add lane {i}"
        assert got_sub[i] == (avals[i] - bvals[i]) % FQ.p, f"sub lane {i}"
    print("field: OK (mm/add/sub, 1024 lanes)")


def stage_ec():
    ck = MP.curve_k(G1)
    g = G1.pyref_spec.generator
    n = 256
    pts = [rng.randrange(1, C.R) * g for _ in range(n)]
    qts = [rng.randrange(1, C.R) * g for _ in range(n)]
    px = enc([p.x.v for p in pts], (n,))
    py = enc([p.y.v for p in pts], (n,))
    pz = enc([1] * n, (n,))
    qx = enc([q.x.v for q in qts], (n,))
    qy = enc([q.y.v for q in qts], (n,))
    qz = enc([1] * n, (n,))
    # map_padd
    got = E.map_padd(ck, (px, py, pz), (qx, qy, qz), interpret=INTERPRET)
    gx, gy, gz = dec(got[0]), dec(got[1]), dec(got[2])
    for i in range(n):
        want = (pts[i] + qts[i])
        zinv = pow(gz[i], -1, FQ.p)
        assert (gx[i] * zinv) % FQ.p == want.x.v and (gy[i] * zinv) % FQ.p == want.y.v, f"padd {i}"
    print("ec: map_padd OK")
    # map_pdouble
    got = E.map_pdouble(ck, (px, py, pz), interpret=INTERPRET)
    gx, gy, gz = dec(got[0]), dec(got[1]), dec(got[2])
    for i in range(n):
        want = pts[i] + pts[i]
        zinv = pow(gz[i], -1, FQ.p)
        assert (gx[i] * zinv) % FQ.p == want.x.v and (gy[i] * zinv) % FQ.p == want.y.v, f"pdouble {i}"
    print("ec: map_pdouble OK")
    # scan_mixed: (nl, L, C) with L=4, C=128; chunk c holds pts[c*L..]
    L, Cc = 4, 128
    xs = np.zeros((16, L, Cc), np.int32)
    ys = np.zeros((16, L, Cc), np.int32)
    allp = pts + qts  # 512 = 4*128
    for s, p in enumerate(allp):
        cidx, j = s // L, s % L
        xs[:, j, cidx] = np.asarray(enc([p.x.v], (1,)))[:, 0]
        ys[:, j, cidx] = np.asarray(enc([p.y.v], (1,)))[:, 0]
    S = E.scan_mixed(ck, jnp.asarray(xs), jnp.asarray(ys), interpret=INTERPRET)
    gx, gy, gz = dec(S[0]), dec(S[1]), dec(S[2])
    # flat index of (j, cidx) in dec order: j*Cc + cidx
    for cidx in range(0, Cc, 17):
        acc = G1.pyref_spec.identity()
        for j in range(L):
            acc = acc + allp[cidx * L + j]
            f = j * Cc + cidx
            zinv = pow(gz[f], -1, FQ.p)
            aff = acc.to_affine()
            assert (gx[f] * zinv) % FQ.p == aff.x.v, f"scan ({j},{cidx})"
    print("ec: scan_mixed OK")


def stage_msm(log_n=13, c=16):
    n = 1 << log_n
    g = G1.pyref_spec.generator
    base_pts = [rng.randrange(1, C.R) * g for _ in range(64)]
    pts = [base_pts[i % 64] for i in range(n)]
    ks = [rng.randrange(C.R) for _ in range(n)]
    xr, yr, inf, gen_xy = MP.prepare_points(G1, pts)
    scal = jnp.asarray(ints_to_limbs(ks).T)
    t0 = time.time()
    out = MP.msm_pallas(MP.curve_k(G1), xr, yr, inf, scal, c=c, gen_xy=gen_xy, interpret=INTERPRET)
    host = tuple(np.asarray(o) for o in out)
    t1 = time.time()
    gx, gy, gz = dec(host[0])[0], dec(host[1])[0], dec(host[2])[0]
    # oracle via tiling: sum_b (sum of ks over lanes ≡ b) * base_b
    want = G1.pyref_spec.identity()
    for b in range(64):
        kb = sum(ks[i] for i in range(b, n, 64)) % C.R
        want = want + kb * base_pts[b]
    wa = want.to_affine()
    zinv = pow(gz, -1, FQ.p)
    assert (gx * zinv) % FQ.p == wa.x.v and (gy * zinv) % FQ.p == wa.y.v, "MSM WRONG"
    print(f"msm: OK n=2^{log_n} c={c} first-run(incl compile)={t1-t0:.1f}s")
    # timed reps with forced host sync
    for _ in range(3):
        t0 = time.time()
        out = MP.msm_pallas(MP.curve_k(G1), xr, yr, inf, scal, c=c, gen_xy=gen_xy, interpret=INTERPRET)
        _ = np.asarray(out[0])
        dt = time.time() - t0
        adds = n * (-(-256 // c))
        print(f"msm: {dt*1e3:.1f} ms -> {adds/dt:.3e} point-adds/s")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "all"
    if stage in ("field", "all"):
        stage_field()
    if stage in ("ec", "all"):
        stage_ec()
    if stage in ("msm", "all"):
        stage_msm()

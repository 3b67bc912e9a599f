"""Prover (parity: groth16/src/prover.rs:20-99).

Device pipeline per proof:
  SpMV Az/Bz/Cz -> batched idft + coset_dft (3 polys stacked on one NTT
  batch axis) -> pointwise H = A.B - C -> divide by Z on coset -> coset_idft
  -> 6 MSMs (h, l, a, b_g1, b_g2 split across inputs/aux implicitly by a
  single MSM over the full assignment each).
Host: witness synthesis, r/s blinding, final O(1) point algebra.
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..curves import G1, G2
from ..errors import ProverSubVersionCrsAttack
from ..fields import FR_OPS
from ..fields.spec import FR as FR_SPEC, ints_to_limbs
from ..ops.msm_pallas import curve_k, decode_point, msm_pallas
from ..ops.ntt import Domain
from ..ops.spmv import matvec
from .circuit import Circuit
from .keys import Parameters, Proof

# One jitted MSM executable per (curve, padded size, window): the proof's
# G1 MSMs (h: n-1, l: m_l_1, a/b: wires) are padded up to a shared
# power-of-two-friendly size so they all hit the same compiled kernel (and
# the same persistent-cache entry as bench.py at 2^20).
_MSM_JIT: dict = {}


def _pad_pow2(n: int) -> int:
    """Pad target: next multiple of 2^13 (keeps msm_pallas's internal pad a
    no-op at large sizes and collapses n-1/m/wires variants onto one shape)."""
    if n >= (1 << 17):
        q = 1 << 16
    elif n >= (1 << 13):
        q = 1 << 13
    else:
        q = 1 << 10
    return -(-n // q) * q


def _msm_call(curve, x, y, inf, scal, gen, mode: str, c=None):
    """Pad inputs (identity points, zero scalars) to the shared shape and run
    through a cached jit (pallas) or eagerly (xla/interpret test modes)."""
    n = x.shape[0]
    target = _pad_pow2(n) if mode == "pallas" else n
    if target != n:
        pad = target - n
        x = jnp.pad(x, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0)))
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)])
        scal = jnp.pad(scal, ((0, 0), (0, pad)))
    ck = curve_k(curve)
    if mode != "pallas":
        return msm_pallas(ck, x, y, inf, scal, c=c, gen_xy=gen, mode=mode)
    key = (curve.cfg.name, target, c)
    fn = _MSM_JIT.get(key)
    if fn is None:
        from functools import partial

        fn = jax.jit(partial(msm_pallas, ck, c=c, gen_xy=gen, mode=mode))
        _MSM_JIT[key] = fn
    return fn(x, y, inf, scal)


class Prover:
    def __init__(self, params: Parameters):
        self.params = params
        self._dom = Domain(params.n.bit_length() - 1)

    def create_proof(self, circuit: Circuit, rng: random.Random | None = None) -> Proof:
        rng = rng or random.Random()
        p = self.params
        r_mod = C.R
        cs = circuit.build()
        dom = self._dom
        n = p.n
        m = cs.m

        # witness vectors
        z_ints = cs.z_ints()
        z_dev = FR_OPS.encode(z_ints)  # (16, wires) Montgomery

        # Az, Bz, Cz on device (pad constraint axis to n)
        evals = [matvec(mat, z_dev, m, FR_SPEC) for mat in p.mats]
        evals = jnp.stack(
            [jnp.pad(e, ((0, 0), (0, n - m))) for e in evals], axis=1
        )  # (16, 3, n)

        # H(X) pipeline
        coeffs = dom.idft(evals)
        on_coset = dom.coset_dft(coeffs)
        a_c, b_c, c_c = on_coset[:, 0], on_coset[:, 1], on_coset[:, 2]
        h = FR_OPS.sub(FR_OPS.mul(a_c, b_c), c_c)
        q = dom.coset_idft(dom.divide_by_z_on_coset(h))
        q_std = FR_OPS.to_std(q)[:, : n - 1]

        # MSMs
        x_std = jnp.asarray(ints_to_limbs(cs.x).T)
        w_std = jnp.asarray(ints_to_limbs(cs.w).T)
        z_std = jnp.concatenate([x_std, w_std], axis=1)

        mode = "xla" if jax.devices()[0].platform == "cpu" else "pallas"

        def run_msm(curve, rows, scal, c=None):
            x, y, inf, gen = rows
            scal = scal.astype(jnp.uint32)
            out = _msm_call(curve, x, y, inf, scal, gen, mode, c)
            return decode_point(curve, out)[0]

        q_pt = run_msm(G1, p.h, q_std)
        l_pt = run_msm(G1, p.l, w_std)
        a_answer = run_msm(G1, p.a, z_std)
        b1_answer = run_msm(G1, p.b_g1, z_std)
        # G2 limb rows are 2x G1's: a narrower window (c=13 -> 4097 buckets
        # instead of 32769) cuts the bucket-phase trace/compile ~8x for a
        # ~25% longer scan phase — the right trade for a once-per-proof MSM
        b2_answer = run_msm(G2, p.b_g2, z_std, c=13 if mode == "pallas" else None)

        vk = p.vk
        if vk.delta_g1.is_infinity or vk.delta_g2.is_infinity:
            # error.rs: ProverSubVersionCrsAttack
            raise ProverSubVersionCrsAttack("CRS delta is the identity")

        r = rng.randrange(r_mod)
        s = rng.randrange(r_mod)

        g_a = vk.delta_g1 * r + vk.alpha_g1 + a_answer
        g_b = vk.delta_g2 * s + vk.beta_g2 + b2_answer
        g_c = (
            vk.delta_g1 * (r * s % r_mod)
            + vk.alpha_g1 * s
            + vk.beta_g1 * r
            + a_answer * s
            + b1_answer * r
            + q_pt
            + l_pt
        )
        return Proof(a=g_a, b=g_b, c=g_c)

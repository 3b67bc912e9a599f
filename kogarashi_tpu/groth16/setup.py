"""Trusted setup (parity: groth16/src/zksnark.rs:17-127 + eval:131-194).

Pipeline:
  host: synthesize circuit, sample toxic waste, powers of tau (ints)
  device: fixed-base h-query [(tau^i t(tau)/delta)] G1,
          Lagrange coefficients (idft of tau powers),
          per-wire QAP evaluations at tau (transposed SpMV),
          ext = (beta*u + alpha*v + w) * {gamma,delta}^-1,
          batched scalar-muls for the A / B_G1 / B_G2 / ic / l queries
  host: the six vk points

Deviation from the reference: the h query has n-1 entries (n = FFT domain
size) rather than m-1 — identical when m is a power of two, and correct for
all m (H(X) has degree up to n-2; the reference truncates, zksnark.rs:40).
"""

from __future__ import annotations

import random

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..curves import G1, G2
from ..curves import point as P
from ..fields import FR_OPS, mont
from ..fields.spec import FR as FR_SPEC, ints_to_limbs
from ..ops.convert import g1_queries_to_rows
from ..ops.fixed_base import fixed_base_mul
from ..ops.ntt import Domain
from ..ops.spmv import r1cs_matrices_device, transposed_matvec
from ..pyref import G1_SPEC, G2_SPEC
from .circuit import Circuit
from .keys import Parameters, VerifyingKey
from .prover import Prover
from .verifier import Verifier


def _fixed_base(curve, scalar_ints):
    """[k_i] G for a batch of host int scalars -> device point batch
    (windowed-table fixed-base: ~31 batched adds instead of a 256-deep
    double-and-add ladder; zksnark.rs:162-193 analogue)."""
    scal = jnp.asarray(ints_to_limbs(scalar_ints).T)
    return fixed_base_mul(curve, scal)


def _scalar_mul_dev(curve, std_scalars):
    """[k_i] G for device standard-form limbs (16, n)."""
    return fixed_base_mul(curve, std_scalars)


def setup(circuit: Circuit, rng: random.Random | None = None):
    """Returns (Prover, Verifier)."""
    rng = rng or random.Random()
    r = C.R
    cs = circuit.build()

    m = cs.m
    n = 1 << (m - 1).bit_length() if m > 1 else 2
    k = n.bit_length() - 1
    dom = Domain(k)

    alpha, beta, gamma, delta, tau = (rng.randrange(1, r) for _ in range(5))
    gamma_inv = pow(gamma, -1, r)
    delta_inv = pow(delta, -1, r)

    # powers of tau (host ints)
    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * tau % r

    # h query: (tau^i * t(tau) / delta) G1, i in [0, n-1)
    t_tau = (pow(tau, n, r) - 1) % r
    coeff = t_tau * delta_inv % r
    h_scalars = [p * coeff % r for p in powers[: n - 1]]
    h_query = _fixed_base(G1, h_scalars)

    # Lagrange coefficients of tau: idft of the powers vector
    lag = dom.idft(FR_OPS.encode(powers))  # (16, n) Montgomery

    # QAP per-wire evaluations at tau via transposed SpMV
    l_pub = cs.l()
    num_wires = l_pub + cs.m_l_1()
    mats = r1cs_matrices_device(cs, FR_SPEC)
    at = transposed_matvec(mats[0], lag, num_wires, FR_SPEC)
    bt = transposed_matvec(mats[1], lag, num_wires, FR_SPEC)
    ct = transposed_matvec(mats[2], lag, num_wires, FR_SPEC)

    # ext = (beta*u + alpha*v + w) * gamma^-1 (inputs) or delta^-1 (aux)
    beta_c = mont.const(beta, FR_SPEC, 1)
    alpha_c = mont.const(alpha, FR_SPEC, 1)
    inv_vec = FR_OPS.encode([gamma_inv] * l_pub + [delta_inv] * cs.m_l_1())
    ext = FR_OPS.mul(
        FR_OPS.add(
            FR_OPS.add(FR_OPS.mul(at, beta_c), FR_OPS.mul(bt, alpha_c)), ct
        ),
        inv_vec,
    )

    at_std = FR_OPS.to_std(at)
    bt_std = FR_OPS.to_std(bt)
    ext_std = FR_OPS.to_std(ext)

    a_query = _scalar_mul_dev(G1, at_std)
    b_g1_query = _scalar_mul_dev(G1, bt_std)
    b_g2_query = _scalar_mul_dev(G2, bt_std)
    ic_query = _scalar_mul_dev(G1, ext_std[:, :l_pub])
    l_query = _scalar_mul_dev(G1, ext_std[:, l_pub:])

    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    vk = VerifyingKey(
        alpha_g1=alpha * g1,
        beta_g1=beta * g1,
        beta_g2=beta * g2,
        gamma_g2=gamma * g2,
        delta_g1=delta * g1,
        delta_g2=delta * g2,
        ic=G1.decode_points(ic_query),
    )
    # G1 query batches feed the Pallas MSM: convert once to 13-bit affine rows
    params = Parameters(
        vk=vk,
        h=g1_queries_to_rows(G1, h_query),
        l=g1_queries_to_rows(G1, l_query),
        a=g1_queries_to_rows(G1, a_query),
        b_g1=g1_queries_to_rows(G1, b_g1_query),
        b_g2=g1_queries_to_rows(G2, b_g2_query),
        l_pub=l_pub,
        n=n,
        mats=mats,
        num_wires=num_wires,
    )
    return Prover(params), Verifier(vk.prepare())

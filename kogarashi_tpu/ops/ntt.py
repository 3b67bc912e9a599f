"""Radix-2 NTT over Fr (or any FftField spec) — TPU-shaped.

Semantics mirror the reference domain (groth16/src/fft.rs): bit-reverse the
input, run decimation-in-time butterflies with twiddles g^j (g = 2^k-th root
of unity), producing natural-order evaluations eval[i] = f(w^i); idft uses
inverse twiddles and scales by n^-1; coset transforms pre/post-multiply by
powers of the multiplicative generator; `divide_by_z_on_coset` scales by
(g^n - 1)^-1.

TPU formulation: each butterfly stage is one whole-array reshape + one batched
Montgomery multiply + add/sub over (16, ..., n) limb-major arrays — log2(n)
stages, each a handful of XLA ops, lanes full of coefficients. Twiddle/coset
tables are host-precomputed ints (one-time per domain) living on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..fields import mont
from ..fields.spec import FieldSpec, N_LIMBS
from ..fields.spec import FR as FR_SPEC

U32 = jnp.uint32


def _bit_reverse_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class Domain:
    """2^k-point NTT domain over `spec` (default Fr).

    Tables are Montgomery-form device arrays; transforms act on limb-major
    (16, ..., n) arrays with the evaluation axis last.
    """

    def __init__(self, k: int, spec: FieldSpec = FR_SPEC):
        assert 1 <= k <= spec.s
        self.k = k
        self.n = n = 1 << k
        self.spec = spec
        p = spec.p

        g = pow(spec.root_of_unity, 1 << (spec.s - k), p)  # 2^k-th root
        g_inv = pow(g, -1, p)
        mul_g = spec.generator
        mul_g_inv = pow(mul_g, -1, p)

        def powers(base, count):
            out, acc = [], 1
            for _ in range(count):
                out.append(acc)
                acc = acc * base % p
            return out

        enc = lambda vals: jnp.asarray(spec.encode(vals).T)  # (16, len)
        self.twiddles = enc(powers(g, n // 2))
        self.inv_twiddles = enc(powers(g_inv, n // 2))
        self.cosets = enc(powers(mul_g, n))
        self.inv_cosets = enc(powers(mul_g_inv, n))
        self.n_inv = enc([pow(n, -1, p)])
        self.z_coset_inv = enc([pow(pow(mul_g, n, p) - 1, -1, p)])
        self.perm = jnp.asarray(_bit_reverse_perm(k))
        self.root = g

    # -- core butterfly pipeline -------------------------------------------
    def _fft(self, x, twiddles):
        n, spec = self.n, self.spec
        assert x.shape[-1] == n
        x = jnp.take(x, self.perm, axis=-1)
        m = 1
        while m < n:
            stride = n // (2 * m)
            tw = twiddles[:, ::stride][:, :m]  # (16, m)
            tw = tw.reshape((N_LIMBS,) + (1,) * (x.ndim - 1) + (m,))
            shape = x.shape
            xr = x.reshape(*shape[:-1], n // (2 * m), 2, m)
            u = xr[..., 0, :]
            v = mont.mont_mul(xr[..., 1, :], tw, spec)
            hi = mont.add(u, v, spec)
            lo = mont.sub(u, v, spec)
            x = jnp.stack([hi, lo], axis=-2).reshape(shape)
            m *= 2
        return x

    def dft(self, coeffs):
        """Coefficients -> natural-order evaluations at w^i."""
        return self._fft(coeffs, self.twiddles)

    def idft(self, evals):
        """Evaluations -> coefficients (scaled by n^-1)."""
        out = self._fft(evals, self.inv_twiddles)
        return mont.mont_mul(out, self._col(self.n_inv, out.ndim), self.spec)

    def coset_dft(self, coeffs):
        """Evaluate on the coset g*w^i (multiply coeff_i by g^i first)."""
        scaled = mont.mont_mul(coeffs, self._table(self.cosets, coeffs.ndim), self.spec)
        return self.dft(scaled)

    def coset_idft(self, evals):
        """Inverse of coset_dft."""
        out = self.idft(evals)
        return mont.mont_mul(out, self._table(self.inv_cosets, out.ndim), self.spec)

    def divide_by_z_on_coset(self, evals):
        """Divide coset evaluations by Z(g*w^i) = g^n - 1 (constant on coset)."""
        return mont.mont_mul(evals, self._col(self.z_coset_inv, evals.ndim), self.spec)

    def z_at(self, tau_int: int) -> int:
        """Vanishing polynomial value tau^n - 1 (host int)."""
        return (pow(tau_int, self.n, self.spec.p) - 1) % self.spec.p

    # -- helpers -----------------------------------------------------------
    def _col(self, scalar_arr, ndim):
        return scalar_arr.reshape((N_LIMBS,) + (1,) * (ndim - 1))

    def _table(self, table, ndim):
        """(16, n) table broadcast against (16, ..., n)."""
        return table.reshape((N_LIMBS,) + (1,) * (ndim - 2) + (self.n,))

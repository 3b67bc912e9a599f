"""Distributed radix-2 NTT via the 4-step (Bailey) decomposition.

N = N1 * N2 with the N2 axis sharded over the mesh:
  1. local DFT_N1 along columns (each device owns N2/D full columns),
  2. twiddle by w_N^(k1 * n2),
  3. all-to-all transpose so k1 becomes the sharded axis,
  4. local DFT_N2 along rows.

Output equals the flat natural-order DFT up to the (k2, k1) layout
transpose, which `gathered()` undoes for verification; the distributed
Groth16 pipeline keeps the transposed layout between stages. Cross-chip
traffic is exactly one all-to-all of the coefficient array (the ICI-friendly
formulation of the first log2(D) butterfly stages).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fields import mont
from ..fields.spec import FieldSpec, N_LIMBS
from ..fields.spec import FR as FR_SPEC
from ..ops.ntt import Domain


class DistributedDomain:
    """2^k-point NTT over `spec`, N2 = 2^k / n1_size sharded across the mesh."""

    def __init__(self, k: int, mesh: Mesh, axis: str = "shard", spec: FieldSpec = FR_SPEC):
        self.k = k
        self.n = 1 << k
        self.mesh = mesh
        self.axis = axis
        self.spec = spec
        nd = mesh.shape[axis]
        assert self.n % (nd * nd) == 0, "need N divisible by D^2"
        # choose N1 = N2 = sqrt-ish split: N1 rows (local axis), N2 columns (sharded)
        self.k1 = k // 2
        self.k2 = k - self.k1
        self.n1 = 1 << self.k1
        self.n2 = 1 << self.k2
        assert self.n2 % nd == 0 and self.n1 % nd == 0
        self.dom1 = Domain(self.k1, spec)
        self.dom2 = Domain(self.k2, spec)
        p = spec.p
        w = pow(spec.root_of_unity, 1 << (spec.s - k), p)  # 2^k-th root
        # twiddle table T[k1, n2] = w^(k1*n2), stored limb-major (16, n1, n2)
        rows = []
        for k1 in range(self.n1):
            base = pow(w, k1, p)
            acc = 1
            row = []
            for _ in range(self.n2):
                row.append(acc)
                acc = acc * base % p
            rows.extend(row)
        self.twiddle = jnp.asarray(spec.encode(rows).T).reshape(
            N_LIMBS, self.n1, self.n2
        )
        w_inv = pow(w, -1, p)
        rows_inv = []
        for k1 in range(self.n1):
            base = pow(w_inv, k1, p)
            acc = 1
            for _ in range(self.n2):
                rows_inv.append(acc)
                acc = acc * base % p
        self.inv_twiddle = jnp.asarray(spec.encode(rows_inv).T).reshape(
            N_LIMBS, self.n1, self.n2
        )
        # coset tables gen^i / gen^-i in the (n1, n2) scatter layout
        # (global index i = n1_idx * N2 + n2_idx), plus Z(coset)^-1
        gmul, gmul_inv = spec.generator, pow(spec.generator, -1, p)
        cs, ics, a, ai = [], [], 1, 1
        for _ in range(self.n):
            cs.append(a)
            ics.append(ai)
            a = a * gmul % p
            ai = ai * gmul_inv % p
        self.coset_table = jnp.asarray(spec.encode(cs).T).reshape(
            N_LIMBS, self.n1, self.n2
        )
        self.inv_coset_table = jnp.asarray(spec.encode(ics).T).reshape(
            N_LIMBS, self.n1, self.n2
        )
        self.z_coset_inv = jnp.asarray(
            spec.encode([pow(pow(gmul, self.n, p) - 1, -1, p)]).T
        )

    def dft(self, x):
        """x: (16, n1, n2) with n2 sharded -> (16, n2_out=k2-index, n1) sharded
        on the last axis (transposed layout)."""
        spec, mesh, axis = self.spec, self.mesh, self.axis
        nd = mesh.shape[axis]
        dom1, dom2, tw = self.dom1, self.dom2, self.twiddle

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis)),
            out_specs=P(None, None, axis),
            check_vma=False,
        )
        def run(xl, twl):
            # step 1: local DFT over the n1 axis (move it last for Domain)
            a = jnp.swapaxes(xl, 1, 2)  # (16, n2_loc, n1)
            a = dom1.dft(a)
            # step 2: twiddle w^(k1*n2)
            a = mont.mont_mul(a, jnp.swapaxes(twl, 1, 2), spec)
            # step 3: all-to-all — reshard from n2-sharded to k1-sharded
            # a: (16, n2_loc, n1) -> split n1 into nd blocks, exchange
            a = a.reshape(N_LIMBS, a.shape[1], nd, a.shape[2] // nd)
            a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=False)
            # now (16, nd, n2_loc, n1/nd): leading device chunks of n2
            a = a.reshape(N_LIMBS, -1, a.shape[-1])  # (16, n2, n1_loc)
            # step 4: local DFT over the n2 axis
            a = jnp.swapaxes(a, 1, 2)  # (16, n1_loc, n2)
            a = dom2.dft(a)
            return jnp.swapaxes(a, 1, 2)  # (16, n2(k2), n1_loc)

        return run(x, tw)

    def idft(self, x):
        """Exact mirror of `dft` (the prover's H-pipeline needs both legs;
        reference semantics: groth16/src/fft.rs:109-150).

        x: (16, n2(=k2), n1(=k1)) transposed evaluation layout, k1 sharded
        -> (16, n1, n2) coefficient layout, n2 sharded. Scale 1/N comes from
        composing dom2.idft (1/N2) with dom1.idft (1/N1)."""
        spec, mesh, axis = self.spec, self.mesh, self.axis
        nd = mesh.shape[axis]
        dom1, dom2 = self.dom1, self.dom2

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis)),
            out_specs=P(None, None, axis),
            check_vma=False,
        )
        def run(xl, itwl):
            # step 1: local inverse DFT over the k2 axis
            a = jnp.swapaxes(xl, 1, 2)  # (16, k1_loc, k2)
            a = dom2.idft(a)  # (16, k1_loc, n2)
            # step 2: all-to-all — reshard from k1-sharded to n2-sharded
            a = a.reshape(N_LIMBS, a.shape[1], nd, a.shape[2] // nd)
            a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=False)
            a = a.reshape(N_LIMBS, -1, a.shape[-1])  # (16, n1(k1), n2_loc)
            # step 3: inverse twiddle w^(-k1*n2)
            a = mont.mont_mul(a, itwl, spec)
            # step 4: local inverse DFT over the k1 axis
            a = jnp.swapaxes(a, 1, 2)  # (16, n2_loc, k1)
            a = dom1.idft(a)
            return jnp.swapaxes(a, 1, 2)  # (16, n1, n2_loc)

        return run(x, self.inv_twiddle)

    def coset_dft(self, coeffs):
        """Evaluate on the coset g*w^i: coeff_i *= gen^i first (same layout
        contract as dft)."""
        return self.dft(self._coset_mul(coeffs, self.coset_table))

    def coset_idft(self, evals):
        """Inverse of coset_dft: idft then divide by gen^i."""
        return self._coset_mul(self.idft(evals), self.inv_coset_table)

    def divide_by_z_on_coset(self, evals):
        """Divide coset evaluations by Z(g*w^i) = g^n - 1 (layout-agnostic:
        a constant elementwise multiply)."""
        c = self.z_coset_inv.reshape(N_LIMBS, 1, 1)
        mesh, axis, spec = self.mesh, self.axis, self.spec

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, axis),),
            out_specs=P(None, None, axis),
            check_vma=False,
        )
        def run(xl):
            return mont.mont_mul(xl, c, spec)

        return run(evals)

    def _coset_mul(self, x, table):
        mesh, axis, spec = self.mesh, self.axis, self.spec

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis)),
            out_specs=P(None, None, axis),
            check_vma=False,
        )
        def run(xl, tl):
            return mont.mont_mul(xl, tl, spec)

        return run(x, table)

    def scatter_evals(self, evals):
        """(16, n) natural-order evaluations -> the (16, k2, k1) transposed
        layout idft consumes (flat index k = k2*n1 + k1 — a pure reshape)."""
        return evals.reshape(N_LIMBS, self.n2, self.n1)

    def gathered_coeffs(self, out):
        """(16, n1, n2) coefficient layout -> flat (16, n) natural order
        (undoes scatter_input)."""
        return out.reshape(N_LIMBS, self.n)

    def scatter_input(self, coeffs):
        """(16, n) flat coefficients -> (16, n1, n2) input layout
        (index = n1_idx * n2 + n2_idx... NB: n = N2*n1 + n2 decimation)."""
        return coeffs.reshape(N_LIMBS, self.n1, self.n2)

    def gathered(self, out):
        """Transposed output (16, k2, k1) -> flat natural order (16, n):
        X[k1 + N1*k2]."""
        # out[*, k2, k1] -> flat index k1 + N1*k2 = transpose to (k2, k1) flat
        return out.reshape(N_LIMBS, self.n)

    def flat_index(self):
        """Map: flat natural-order index k -> (k2, k1) position in output."""
        k = np.arange(self.n)
        k1 = k % self.n1
        k2 = k // self.n1
        return k2 * self.n1 + k1  # position in flattened (k2, k1) layout

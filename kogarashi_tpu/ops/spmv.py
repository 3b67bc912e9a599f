"""Sparse matrix-vector products over field limb arrays (device).

The R1CS matrices live as COO triples; an SpMV is: gather vector entries,
one batched Montgomery multiply, then a uint32 `segment_sum` of the limb
rows (canonical limbs < 2^16, so up to 2^16 addends accumulate exactly in
uint32 lanes) followed by one exact modular reduction. This is the TPU shape
of the reference's row-by-row `SparseMatrix::prod` (zkstd/src/matrix.rs:36)
and of setup's per-wire `eval_at_tau` (groth16/src/zksnark.rs:196 — same
kernel with roles of rows/columns swapped).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.spec import FieldSpec, N_LIMBS


def coo_matvec(coeffs, gather_idx, seg_idx, vec, num_segments: int, spec: FieldSpec):
    """sum over entries e with seg_idx[e]=s of coeffs[e] * vec[gather_idx[e]].

    coeffs: (16, nnz) Montgomery; vec: (16, ncols) Montgomery;
    gather_idx/seg_idx: (nnz,) int32. Returns (16, num_segments) canonical.
    Requires < 2^16 entries per segment (hierarchical split above that).
    """
    prods = mont.mont_mul(coeffs, vec[:, gather_idx], spec)  # (16, nnz)
    sums = jax.ops.segment_sum(prods.T, seg_idx, num_segments=num_segments)
    return mont.reduce_relaxed(sums.T, spec)


def _encode_coeffs(vals, spec: FieldSpec):
    """Coefficient list/array -> (16, nnz) Montgomery limbs. Fast path: when
    values repeat (typical R1CS — mostly +-1), encode the unique set once and
    gather, instead of nnz Python bigint reductions."""
    if isinstance(vals, np.ndarray) and vals.dtype != object:
        uniq, inv = np.unique(vals, return_inverse=True)
        if len(uniq) * 16 < len(vals):
            table = spec.encode([int(u) for u in uniq])  # (u, 16)
            return jnp.asarray(table[inv].T)
        vals = [int(v) for v in vals]
    return jnp.asarray(spec.encode(vals).T)


def r1cs_matrices_device(cs, spec: FieldSpec):
    """Host R1CS -> device COO pytrees for A, B, C (jit-friendly dict)."""
    out = []
    for (ri, ci, vals) in cs.matrices_coo():
        out.append(
            dict(
                row=jnp.asarray(ri),
                col=jnp.asarray(ci),
                coeff=_encode_coeffs(vals, spec),
            )
        )
    return out


def matvec(mat: dict, z, m: int, spec: FieldSpec):
    """A . z for a COO dict (row-indexed segments)."""
    return coo_matvec(mat["coeff"], mat["col"], mat["row"], z, m, spec)


def transposed_matvec(mat: dict, lag, n_wires: int, spec: FieldSpec):
    """Per-wire QAP evaluation: sum_i coeff * lag[row_i], grouped by wire."""
    return coo_matvec(mat["coeff"], mat["row"], mat["col"], lag, n_wires, spec)

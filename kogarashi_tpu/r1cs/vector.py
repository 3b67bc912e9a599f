"""Vectorized R1CS construction for large circuits.

The dict-based `R1CS` builder (system.py) mirrors the reference's per-gate
`SparseRow` appends (zkstd/src/r1cs.rs:102-134) — fine for protocol circuits,
hostile at 2^20 gates. `VecR1CS` holds the three constraint matrices directly
as numpy COO arrays and the witness as a list, exposing the same interface
surface `groth16.setup`/`Prover` consume (m, l(), m_l_1(), matrices_coo(),
z_ints(), x, w, is_sat()). Coefficients are kept as a numpy array plus an
optional small value table so host->device encoding of 2^20-entry matrices
is a table lookup, not 3 million Python bigint reductions.
"""

from __future__ import annotations

import numpy as np


class VecR1CS:
    """COO-backed R1CS: columns index z = x || w (x first, constant wire 0)."""

    def __init__(self, p: int, x: list, w: list, rows, cols, vals, m: int):
        """rows/cols/vals: 3-tuples (A, B, C) of np.int32 / value arrays.
        vals entries are ints mod p (numpy object or int64 arrays)."""
        self.p = p
        self.x = x
        self.w = w
        self._rows = rows
        self._cols = cols
        self._vals = vals
        self.m = m

    def l(self) -> int:
        return len(self.x)

    def m_l_1(self) -> int:
        return len(self.w)

    def matrices_coo(self):
        return tuple(
            (np.asarray(r, np.int32), np.asarray(c, np.int32), v)
            for r, c, v in zip(self._rows, self._cols, self._vals)
        )

    def z_ints(self):
        return self.x + self.w

    def is_sat(self) -> bool:
        z = self.z_ints()
        p = self.p

        def ev(r, c, v):
            out = [0] * self.m
            for i in range(len(r)):
                out[r[i]] += int(v[i]) * z[c[i]]
            return [o % p for o in out]

        az = ev(*[np.asarray(a) for a in (self._rows[0], self._cols[0])], self._vals[0])
        bz = ev(*[np.asarray(a) for a in (self._rows[1], self._cols[1])], self._vals[1])
        cz = ev(*[np.asarray(a) for a in (self._rows[2], self._cols[2])], self._vals[2])
        return all(a * b % p == c for a, b, c in zip(az, bz, cz))


class SquareChainCircuit:
    """Benchmark circuit: m repeated squarings w_{i+1} = w_i^2 with the seed
    and final value public — m constraints, 3m single-entry COO terms, O(m)
    host work. Drop-in for `groth16.setup(circuit)` at 2^20 gates."""

    def __init__(self, m: int, x0: int = 3, p: int | None = None):
        from .. import constants as C

        self.m = m
        self.p = p or C.R
        self.x0 = x0 % self.p

    def build(self) -> VecR1CS:
        p, m = self.p, self.m
        chain = [self.x0]
        v = self.x0
        for _ in range(m):
            v = v * v % p
            chain.append(v)
        # wires: x = [1, x0, out]; w = chain[1:-1] (intermediate squares)
        x = [1, chain[0], chain[-1]]
        w = chain[1:-1]
        l = 3

        def col_of(i):  # wire holding chain[i]
            if i == 0:
                return 1
            if i == m:
                return 2
            return l + i - 1

        idx = np.arange(m, dtype=np.int32)
        cols_in = np.where(idx == 0, 1, l + idx - 1).astype(np.int32)
        cols_out = np.where(idx == m - 1, 2, l + idx).astype(np.int32)
        ones = np.ones(m, dtype=np.int64)
        rows = (idx, idx, idx)
        cols = (cols_in, cols_in, cols_out)
        vals = (ones, ones, ones)
        return VecR1CS(p, x, w, rows, cols, vals, m)

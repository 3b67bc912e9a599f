"""Relaxed R1CS shapes, instances and witnesses for Nova folding.

Parity: nova/src/relaxed_r1cs.rs + relaxed_r1cs/{instance,witness}.rs.
Field values are host ints; commitments are pyref AffinePoints on the
driver's commitment curve (G1 for the Fr circuit, Grumpkin for the Fq one).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from ..pyref import MimcRO
from .. import constants as C


@dataclass
class R1csShape:
    """Frozen structure (m, l, m_l_1, A, B, C) of a synthesized R1CS."""

    driver: object
    m: int
    instance_length: int  # l (public inputs, excluding the one-wire)
    witness_length: int  # m_l_1
    a: list  # LinComb rows
    b: list
    c: list

    @classmethod
    def from_r1cs(cls, cs) -> "R1csShape":
        return cls(
            driver=cs.driver,
            m=cs.m,
            instance_length=cs.l() - 1,
            witness_length=cs.m_l_1(),
            a=list(cs.a),
            b=list(cs.b),
            c=list(cs.c),
        )

    @property
    def p(self) -> int:
        return self.driver.scalar.p

    def l(self) -> int:
        return self.instance_length

    def m_l_1(self) -> int:
        return self.witness_length

    def _prod(self, rows, z, l):
        """SparseMatrix::prod with z = [u | x | w] and instance offset l.

        Uses the native (C++) cached-CSR engine when available — the 6 SpMVs
        of every NIFS cross-term (nifs.py:57-62) are the host-side hot loop
        of IVC proving; the matrix converts to native form once per shape.
        """
        csr = self._native_csr(id(rows), rows, l)
        if csr is not None:
            return csr.mv(z)
        out = []
        p = self.p
        for row in rows:
            s = 0
            for (kind, i), coeff in row.terms.items():
                v = z[i] if kind == "x" else z[i + l]
                s += coeff * v
            out.append(s % p)
        return out

    def _native_csr(self, key, rows, l):
        """Lazily-built native CSR for a row list (None if native unavailable)."""
        from .. import native

        if not native.available():
            return None
        cache = self.__dict__.setdefault("_csr_cache", {})
        hit = cache.get((key, l))
        if hit is None:
            indptr, indices, data = [0], [], []
            p = self.p
            for row in rows:
                for (kind, i), coeff in row.terms.items():
                    indices.append(i if kind == "x" else i + l)
                    data.append(coeff % p)
                indptr.append(len(indices))
            hit = cache[(key, l)] = native.CSR(indptr, indices, data, p)
        return hit

    def is_sat_relaxed(self, instance: "RelaxedR1csInstance", witness: "RelaxedR1csWitness") -> bool:
        """(A.z) o (B.z) == u*(C.z) + E with z = [u, x, w]."""
        p = self.p
        z = [instance.u] + list(instance.x) + list(witness.w)
        l = len(instance.x) + 1
        az = self._prod(self.a, z, l)
        bz = self._prod(self.b, z, l)
        cz = self._prod(self.c, z, l)
        return all(
            a * b % p == (instance.u * c + e) % p
            for a, b, c, e in zip(az, bz, cz, witness.e)
        )

    def is_sat(self, ck, instance: "R1csInstance", witness: "R1csWitness") -> bool:
        p = self.p
        z = [1] + list(instance.x) + list(witness.w)
        l = len(instance.x) + 1
        az = self._prod(self.a, z, l)
        bz = self._prod(self.b, z, l)
        cz = self._prod(self.c, z, l)
        constraints = all(a * b % p == c for a, b, c in zip(az, bz, cz))
        return constraints and instance.commit_w == ck.commit(witness.w)


@dataclass
class R1csInstance:
    commit_w: object  # AffinePoint
    x: list  # ints, len l

    @classmethod
    def dummy(cls, driver, x_len: int) -> "R1csInstance":
        return cls(commit_w=driver.commit_curve.identity_affine(), x=[0] * x_len)


@dataclass
class R1csWitness:
    w: list

    def commit(self, ck):
        return ck.commit(self.w)


@dataclass
class RelaxedR1csInstance:
    driver: object
    commit_w: object
    commit_e: object
    u: int
    x: list

    @classmethod
    def dummy(cls, driver, x_len: int) -> "RelaxedR1csInstance":
        ident = driver.commit_curve.identity_affine()
        return cls(driver=driver, commit_w=ident, commit_e=ident, u=0, x=[0] * x_len)

    @classmethod
    def from_r1cs_instance(cls, driver, instance: R1csInstance) -> "RelaxedR1csInstance":
        ident = driver.commit_curve.identity_affine()
        return cls(
            driver=driver,
            commit_w=instance.commit_w,
            commit_e=ident,
            u=1,
            x=list(instance.x),
        )

    def fold(self, instance: R1csInstance, r: int, commit_t) -> "RelaxedR1csInstance":
        p = self.driver.scalar.p
        return RelaxedR1csInstance(
            driver=self.driver,
            commit_e=self.commit_e + r * commit_t,
            u=(self.u + r) % p,
            commit_w=self.commit_w + r * instance.commit_w,
            x=[(a + r * b) % p for a, b in zip(self.x, instance.x)],
        )

    def absorb_by_transcript(self, transcript: MimcRO):
        """instance.rs:103 — points, u (as base), x as 4x64-bit limbs (as base)."""
        base = self.driver.base
        transcript.append_point(self.commit_w)
        transcript.append_point(self.commit_e)
        transcript.append(base(self.u % base.p))
        for x in self.x:
            for limb_i in range(C.BN_N_LIMBS):
                limb = (x >> (C.BN_LIMB_WIDTH * limb_i)) & ((1 << C.BN_LIMB_WIDTH) - 1)
                transcript.append(base(limb))

    def hash(self, i: int, z0: list, zi: list) -> int:
        """hash(i, z0, zi, self) squeezed to HASH_BITS (instance.rs:118)."""
        base, scalar = self.driver.base, self.driver.scalar
        ro = MimcRO(base, scalar)
        ro.append(base(i))
        ro.append_vec([base(v) for v in z0])
        ro.append_vec([base(v) for v in zi])
        self.absorb_by_transcript(ro)
        return ro.squeeze(C.HASH_BITS).v


@dataclass
class RelaxedR1csWitness:
    w: list
    e: list

    @classmethod
    def dummy(cls, w_len: int, m: int) -> "RelaxedR1csWitness":
        return cls(w=[0] * w_len, e=[0] * m)

    @classmethod
    def from_r1cs_witness(cls, shape: R1csShape, witness: R1csWitness) -> "RelaxedR1csWitness":
        return cls(w=list(witness.w), e=[0] * shape.m)

    def fold(self, witness: R1csWitness, r: int, t: list, p: int) -> "RelaxedR1csWitness":
        return RelaxedR1csWitness(
            w=[(a + r * b) % p for a, b in zip(self.w, witness.w)],
            e=[(a + r * b) % p for a, b in zip(self.e, t)],
        )


def r1cs_instance_and_witness(cs, shape: R1csShape, ck):
    """(R1csInstance, R1csWitness) from a synthesized circuit
    (relaxed_r1cs.rs:24-40)."""
    assert cs.m_l_1() == shape.m_l_1()
    assert cs.m == shape.m
    w = list(cs.w)
    x = list(cs.x[1:])
    assert len(x) == shape.l()
    witness = R1csWitness(w=w)
    commit_w = witness.commit(ck)
    return R1csInstance(commit_w=commit_w, x=x), witness

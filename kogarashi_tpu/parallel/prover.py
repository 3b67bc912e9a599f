"""Distributed Groth16 proving phases composed from the sharded primitives.

`distributed_h_coeffs` is the prover's H-polynomial pipeline
(groth16/src/prover.rs:30-43 semantics: idft -> coset_dft -> A.B - C ->
/Z -> coset_idft) where every transform is a DistributedDomain 4-step NTT
(one all-to-all each) and the elementwise algebra runs shard-local — no
coefficient ever leaves its device between transforms.
"""

from __future__ import annotations

from functools import partial

from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..fields import mont
from .ntt import DistributedDomain


def distributed_h_coeffs(dd: DistributedDomain, az, bz, cz):
    """az/bz/cz: flat (16, n) natural-order evaluations of A.z, B.z, C.z on
    the domain -> flat (16, n) coefficients of H = (A.B - C) / Z.

    Layout: scatter -> idft (k1-sharded in, n2-sharded out) -> coset_dft
    (back to k1-sharded) -> local A.B - C and /Z(coset) -> coset_idft ->
    gather. 6 all-to-alls total, everything else shard-local."""
    spec = dd.spec

    def to_coset(v):
        return dd.coset_dft(dd.idft(dd.scatter_evals(v)))

    a_c, b_c, c_c = to_coset(az), to_coset(bz), to_coset(cz)

    @partial(
        shard_map,
        mesh=dd.mesh,
        in_specs=(P(None, None, dd.axis),) * 3,
        out_specs=P(None, None, dd.axis),
        check_vma=False,
    )
    def hadamard(a, b, c):
        return mont.sub(mont.mont_mul(a, b, spec), c, spec)

    h = dd.divide_by_z_on_coset(hadamard(a_c, b_c, c_c))
    return dd.gathered_coeffs(dd.coset_idft(h))

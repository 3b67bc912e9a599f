"""Multi-chip sharding: distributed MSM and 4-step NTT on the virtual
8-device CPU mesh vs single-device results."""

import jax
import jax.numpy as jnp
import pytest

from kogarashi_tpu.curves import G1
from kogarashi_tpu.fields import FR_OPS
from kogarashi_tpu.fields.spec import ints_to_limbs
from kogarashi_tpu.ops.msm import msm
from kogarashi_tpu.ops.ntt import Domain
from kogarashi_tpu.parallel import DistributedDomain, distributed_msm, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.mark.slow
def test_distributed_msm_matches_single(mesh, rng):
    n = 64
    g = G1.pyref_spec.generator
    pts = [rng.randrange(2**64) * g for _ in range(n)]
    ks = [rng.randrange(2**254) for _ in range(n)]
    p_dev = G1.encode_points(pts)
    s_dev = jnp.asarray(ints_to_limbs(ks).T)
    out = distributed_msm(G1.cfg, p_dev, s_dev, mesh, c=6)
    single = msm(G1.cfg, p_dev, s_dev, c=6)
    got = G1.decode_points(tuple(x[..., None] for x in out))[0]
    want = G1.decode_points(tuple(x[..., None] for x in single))[0]
    assert got == want


def test_distributed_ntt_matches_single(mesh, rng):
    k = 8
    dd = DistributedDomain(k, mesh)
    coeffs = [rng.randrange(FR_OPS.spec.p) for _ in range(1 << k)]
    x = FR_OPS.encode(coeffs)
    out = dd.gathered(dd.dft(dd.scatter_input(x)))
    want = Domain(k).dft(x)
    assert FR_OPS.decode(out) == FR_OPS.decode(want)


def test_distributed_idft_roundtrip(mesh, rng):
    k = 8
    dd = DistributedDomain(k, mesh)
    coeffs = [rng.randrange(FR_OPS.spec.p) for _ in range(1 << k)]
    x = FR_OPS.encode(coeffs)
    back = dd.gathered_coeffs(dd.idft(dd.dft(dd.scatter_input(x))))
    assert FR_OPS.decode(back) == coeffs
    # and idft agrees with the single-device Domain on fresh evals
    evals = Domain(k).dft(x)
    got = dd.gathered_coeffs(dd.idft(dd.scatter_evals(evals)))
    want = Domain(k).idft(evals)
    assert FR_OPS.decode(got) == FR_OPS.decode(want)


def test_distributed_coset_and_divide(mesh, rng):
    k = 8
    dd = DistributedDomain(k, mesh)
    dom = Domain(k)
    coeffs = [rng.randrange(FR_OPS.spec.p) for _ in range(1 << k)]
    x = FR_OPS.encode(coeffs)
    got = dd.gathered(dd.coset_dft(dd.scatter_input(x)))
    want = dom.coset_dft(x)
    assert FR_OPS.decode(got) == FR_OPS.decode(want)
    ev = dom.coset_dft(x)
    got2 = dd.gathered_coeffs(
        dd.coset_idft(dd.divide_by_z_on_coset(dd.scatter_evals(ev)))
    )
    want2 = dom.coset_idft(dom.divide_by_z_on_coset(ev))
    assert FR_OPS.decode(got2) == FR_OPS.decode(want2)


def test_distributed_h_pipeline_matches_single(mesh, rng):
    """The prover's full H-polynomial leg, distributed vs single-device
    (groth16/src/prover.rs:30-43 semantics)."""
    from kogarashi_tpu.parallel import distributed_h_coeffs

    k = 8
    n = 1 << k
    p = FR_OPS.spec.p
    dd = DistributedDomain(k, mesh)
    dom = Domain(k)
    az = [rng.randrange(p) for _ in range(n)]
    bz = [rng.randrange(p) for _ in range(n)]
    # choose C.z = A.z * B.z pointwise so H is exact (a satisfied R1CS)
    cz = [a * b % p for a, b in zip(az, bz)]
    A, B, Cv = (FR_OPS.encode(v) for v in (az, bz, cz))
    got = distributed_h_coeffs(dd, A, B, Cv)

    from kogarashi_tpu.fields import mont

    coeffs = dom.idft(jnp.stack([A, B, Cv], axis=1))
    on_coset = dom.coset_dft(coeffs)
    h = mont.sub(
        mont.mont_mul(on_coset[:, 0], on_coset[:, 1], FR_OPS.spec),
        on_coset[:, 2],
        FR_OPS.spec,
    )
    want = dom.coset_idft(dom.divide_by_z_on_coset(h))
    assert FR_OPS.decode(got) == FR_OPS.decode(want)


@pytest.mark.slow
def test_distributed_msm_pallas_matches_oracle(mesh, rng):
    """Flagship engine sharded on the point axis (xla executor on the CPU
    mesh) vs the host pyref oracle."""
    from kogarashi_tpu.ops.msm_pallas import decode_point, prepare_points
    from kogarashi_tpu.parallel import distributed_msm_pallas
    from kogarashi_tpu import constants as C

    n = 64
    g = G1.pyref_spec.generator
    pts = [rng.randrange(1, C.R) * g for _ in range(n)]
    pts[3] = G1.pyref_spec.identity_affine()
    ks = [rng.randrange(C.R) for _ in range(n - 2)] + [0, C.R - 1]
    x, y, inf, gen = prepare_points(G1, pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    out = distributed_msm_pallas(G1, x, y, inf, s, gen, mesh, c=8, mode="xla")
    got = decode_point(G1, tuple(c[..., 0:1] for c in out))[0]
    acc = G1.pyref_spec.identity_affine()
    for p_, k_ in zip(pts, ks):
        acc = acc + (k_ % C.R) * p_
    assert got == acc

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

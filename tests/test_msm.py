"""MSM vs naive oracle (mirrors groth16/src/msm.rs:118-135 test)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves import G1, G2, GRUMPKIN
from kogarashi_tpu.fields.spec import ints_to_limbs
from kogarashi_tpu.ops.msm import msm, default_window


def _naive(pts, ks):
    acc = pts[0].spec.identity_affine()
    for p, k in zip(pts, ks):
        acc = acc + k * p
    return acc


@pytest.mark.parametrize("curve,order", [(G1, C.R), (GRUMPKIN, C.Q)], ids=["g1", "grumpkin"])
def test_msm_small_vs_naive(curve, order, rng):
    n = 24
    g = curve.pyref_spec.generator
    pts = [rng.randrange(order) * g for _ in range(n)]
    ks = [rng.randrange(order) for _ in range(n - 3)] + [0, 1, order - 1]
    p_dev = curve.encode_points(pts)
    s_dev = jnp.asarray(ints_to_limbs(ks).T)
    out = msm(curve.cfg, p_dev, s_dev, c=6)
    got = curve.decode_points(tuple(x[..., None] for x in out))[0]
    assert got == _naive(pts, ks)


def test_msm_g2_small(rng):
    n = 12
    g = G2.pyref_spec.generator
    pts = [rng.randrange(C.R) * g for _ in range(n)]
    ks = [rng.randrange(C.R) for _ in range(n)]
    p_dev = G2.encode_points(pts)
    s_dev = jnp.asarray(ints_to_limbs(ks).T)
    out = msm(G2.cfg, p_dev, s_dev, c=6)
    got = G2.decode_points(tuple(x[..., None] for x in out))[0]
    assert got == _naive(pts, ks)


def test_msm_with_identity_points(rng):
    n = 8
    g = G1.pyref_spec.generator
    pts = [rng.randrange(C.R) * g for _ in range(n - 2)]
    pts += [G1.pyref_spec.identity_affine()] * 2
    ks = [rng.randrange(C.R) for _ in range(n)]
    p_dev = G1.encode_points(pts)
    s_dev = jnp.asarray(ints_to_limbs(ks).T)
    out = msm(G1.cfg, p_dev, s_dev, c=6)
    got = G1.decode_points(tuple(x[..., None] for x in out))[0]
    assert got == _naive(pts, ks)


def test_default_window():
    assert default_window(32) == 8
    assert default_window(1 << 20) == 16

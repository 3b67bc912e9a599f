"""Windowed fixed-base scalar-mul vs pyref oracle (setup query path)."""

import jax.numpy as jnp

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves import G1, G2
from kogarashi_tpu.fields.spec import ints_to_limbs
from kogarashi_tpu.ops.fixed_base import FixedBaseTable


import pytest


@pytest.mark.parametrize("c", [8, 13])  # c=13 straddles 16-bit limb edges
def test_fixed_base_g1(rng, c):
    t = FixedBaseTable(G1, c=c)
    ks = [0, 1, 2, C.R - 1, 1 << 128] + [rng.randrange(C.R) for _ in range(11)]
    out = t.mul(jnp.asarray(ints_to_limbs(ks).T))
    got = G1.decode_points(out)
    g = G1.pyref_spec.generator
    for k, pt in zip(ks, got):
        assert pt == (k % C.R) * g


def test_fixed_base_g2(rng):
    t = FixedBaseTable(G2, c=8)
    ks = [0, 1, C.R - 1] + [rng.randrange(C.R) for _ in range(5)]
    out = t.mul(jnp.asarray(ints_to_limbs(ks).T))
    got = G2.decode_points(out)
    g = G2.pyref_spec.generator
    for k, pt in zip(ks, got):
        assert pt == (k % C.R) * g

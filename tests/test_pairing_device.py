"""Device tower + pairing vs the pyref oracle."""

import pytest

from kogarashi_tpu.pyref import Fq, Fq12, G1_SPEC, G2_SPEC
from kogarashi_tpu.pyref.pairing_fast import pairing_fast
import jax

from kogarashi_tpu.ops.pairing import (
    decode_fq12,
    encode_fq12,
    f12_frobenius,
    f12_inv_jit,
    f12_mul_jit,
    f12_sq_jit,
    pairing_device,
)


def _rand_f12(rng):
    return Fq12.from_fq_list([Fq(rng.randrange(Fq.p)) for _ in range(12)])


def test_f12_roundtrip_and_ops(rng):
    a, b = _rand_f12(rng), _rand_f12(rng)
    da, db = encode_fq12(a), encode_fq12(b)
    assert decode_fq12(da) == a
    assert decode_fq12(f12_mul_jit(da, db)) == a * b
    assert decode_fq12(f12_sq_jit(da)) == a.square()
    assert decode_fq12(f12_inv_jit(da)) == a.invert()
    frob = jax.jit(f12_frobenius, static_argnums=1)
    for power in (1, 2, 6):
        assert decode_fq12(frob(da, power)) == a.frobenius(power)


@pytest.mark.slow
def test_device_pairing_matches_oracle(rng):
    g1, g2 = G1_SPEC.generator, G2_SPEC.generator
    a = rng.randrange(1, 2**32)
    got = decode_fq12(pairing_device(a * g1, g2))
    assert got == pairing_fast(a * g1, g2)

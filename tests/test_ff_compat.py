"""ff-compat interop layer vs reference anchors
(bn254/src/ff_compat.rs:9-28, 171-196; g1.rs RAW_SIZE serde)."""

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.errors import MalformedProof
from kogarashi_tpu.pyref import Fq, Fr, G1_SPEC, GRUMPKIN_SPEC
from kogarashi_tpu.utils.ff_compat import (
    FQ_PARAMS,
    FR_PARAMS,
    RAW_SIZE,
    from_raw_bytes,
    from_repr,
    from_slice_unchecked,
    is_odd,
    to_raw_bytes,
    to_repr,
)


def _limbs_to_int(limbs):
    return sum(v << (64 * i) for i, v in enumerate(limbs))


def test_fr_constants_match_reference():
    # ff_compat.rs:9-28 (standard-form u64 limbs fed to to_mont_form)
    assert FR_PARAMS.two_inv == _limbs_to_int(
        [0xA1F0FAC9F8000001, 0x9419F4243CDCB848, 0xDC2822DB40C0AC2E, 0x183227397098D014]
    )
    assert FR_PARAMS.root_of_unity_inv == _limbs_to_int(
        [0x0ED3E50A414E6DBA, 0xB22625F59115ABA7, 0x1BBE587180F34361, 0x048127174DAABC26]
    )
    assert FR_PARAMS.delta == _limbs_to_int(
        [0x870E56BBE533E9A2, 0x5B5F898E5E963F25, 0x64EC26AAD4C86E71, 0x09226B6E22C6F0CA]
    )
    assert FR_PARAMS.num_bits == 254 and FR_PARAMS.capacity == 253


def test_fq_constants_match_reference():
    # ff_compat.rs:171-196: S=1 for Fq (q = 3 mod 4), root of unity = -1,
    # delta = 3^2 = 9
    assert FQ_PARAMS.s == 1
    assert FQ_PARAMS.root_of_unity == C.Q - 1
    assert FQ_PARAMS.root_of_unity_inv == C.Q - 1
    assert FQ_PARAMS.delta == 9
    assert FQ_PARAMS.two_inv == _limbs_to_int(
        [0x9E10460B6C3E7EA4, 0xCBC0B548B438E546, 0xDC2822DB40C0AC2E, 0x183227397098D014]
    )


def test_repr_roundtrip(rng):
    for field in (Fr, Fq):
        for _ in range(10):
            v = field(rng.randrange(field.p))
            assert from_repr(to_repr(v), field) == v
        assert from_repr((field.p).to_bytes(32, "little"), field) is None
    assert is_odd(Fr(3)) and not is_odd(Fr(4))


def test_raw_point_roundtrip(rng):
    for spec in (G1_SPEC, GRUMPKIN_SPEC):
        g = spec.generator
        for k in (1, 2, 12345, rng.randrange(1, 2**64)):
            pt = k * g
            raw = to_raw_bytes(pt)
            assert len(raw) == RAW_SIZE
            assert from_slice_unchecked(raw, spec) == pt
            assert from_raw_bytes(raw, spec) == pt
        ident = spec.identity_affine()
        raw = to_raw_bytes(ident)
        assert raw[RAW_SIZE - 1] == 1
        assert from_raw_bytes(raw, spec).is_infinity


def test_raw_point_validation():
    g = G1_SPEC.generator
    raw = to_raw_bytes(g)
    with pytest.raises(MalformedProof):
        from_raw_bytes(raw[:-1], G1_SPEC)  # truncated
    bad = bytearray(raw)
    bad[0] ^= 1  # off-curve x
    with pytest.raises(MalformedProof):
        from_raw_bytes(bytes(bad), G1_SPEC)
    noncanon = bytearray(raw)
    noncanon[0:32] = (G1_SPEC.field.p).to_bytes(32, "little")
    with pytest.raises(MalformedProof):
        from_raw_bytes(bytes(noncanon), G1_SPEC)
    # from_slice_unchecked mirrors the reference: no validation at all
    from_slice_unchecked(bytes(bad), G1_SPEC)

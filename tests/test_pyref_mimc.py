"""MiMC / transcript oracle tests (parity: nova/src/hash.rs tests)."""

from kogarashi_tpu import constants as C
from kogarashi_tpu.pyref import Fq, Fr, Mimc, MimcRO, mimc_constants


def test_constants_shape_and_determinism():
    c1 = mimc_constants(Fr)
    c2 = mimc_constants(Fr)
    assert len(c1) == C.MIMC_ROUNDS == 46
    assert c1 == c2
    assert len(set(x.v for x in c1)) == 46  # all distinct


def test_constants_chained_blake2b_regression():
    """Pin the derivation so Fiat-Shamir can never silently drift.

    constant_0 = from_bytes_wide(blake2b_512(person=b"mimc", data=blake2b_512(person=b"mimc", data=b"")))
    """
    import hashlib

    h0 = hashlib.blake2b(digest_size=64, person=b"mimc").digest()
    h1 = hashlib.blake2b(h0, digest_size=64, person=b"mimc").digest()
    expect = int.from_bytes(h1, "little") % C.R
    assert mimc_constants(Fr)[0].v == expect


def test_hash_differs_by_input(rng):
    m = Mimc(Fr)
    a, b = Fr.random(rng), Fr.random(rng)
    assert m.hash(a, b) != m.hash(b, a) or a == b
    assert m.hash(a, b) == m.hash(a, b)


def test_squeeze_cross_field(rng):
    """Transcript over Fq squeezing into Fr (the Bn254Driver direction)."""
    ro = MimcRO(Fq, Fr)
    ro.append(Fq(1))
    ro.append(Fq(2))
    r1 = ro.squeeze(C.CHALLENGE_BITS)
    assert isinstance(r1, Fr)
    assert r1.v < (1 << C.CHALLENGE_BITS)
    # absorbing more changes the squeeze
    ro.append(Fq(3))
    assert ro.squeeze(C.CHALLENGE_BITS) != r1


def test_append_point(rng):
    from kogarashi_tpu.pyref import GRUMPKIN_SPEC

    ro = MimcRO(Fr, Fq)
    ro.append_point(GRUMPKIN_SPEC.generator)
    v = ro.squeeze(C.HASH_BITS)
    assert v.v < (1 << C.HASH_BITS)
    ro2 = MimcRO(Fr, Fq)
    ro2.append_point(GRUMPKIN_SPEC.identity_affine())
    assert ro2.squeeze(C.HASH_BITS) != v

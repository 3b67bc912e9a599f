"""Field laws for the pure-Python oracle (mirrors zkstd's field_test! macro,
zkstd/src/macros/field/test.rs)."""

from kogarashi_tpu.pyref import Fq, Fr, Fq2, Fq6, Fq12
from kogarashi_tpu import constants as C


def _field_laws(F, rng, n=25):
    for _ in range(n):
        a, b, c = (F.random(rng) for _ in range(3))
        assert a + b == b + a
        assert (a + b) + c == a + (b + c)
        assert a * b == b * a
        assert (a * b) * c == a * (b * c)
        assert a * (b + c) == a * b + a * c
        assert a - a == F.zero()
        assert a + F.zero() == a
        assert a * F.one() == a
        assert a.square() == a * a
        assert a.double() == a + a
        if not a.is_zero():
            assert a * a.invert() == F.one()


def test_fr_laws(rng):
    _field_laws(Fr, rng)


def test_fq_laws(rng):
    _field_laws(Fq, rng)


def _ext_laws(F, rand, n=10):
    one = F.one()
    zero = F.zero()
    for _ in range(n):
        a, b, c = rand(), rand(), rand()
        assert (a + b) + c == a + (b + c)
        assert a * b == b * a
        assert (a * b) * c == a * (b * c)
        assert a * (b + c) == a * b + a * c
        assert a * one == a
        assert a + zero == a
        assert a.square() == a * a
        if not a.is_zero():
            assert a * a.invert() == one


def test_fq2_laws(rng):
    _ext_laws(Fq2, lambda: Fq2(Fq.random(rng), Fq.random(rng)))


def test_fq6_laws(rng):
    def rand():
        return Fq6(*[Fq2(Fq.random(rng), Fq.random(rng)) for _ in range(3)])

    _ext_laws(Fq6, rand)


def test_fq12_laws(rng):
    def rand():
        return Fq12.from_fq_list([Fq.random(rng) for _ in range(12)])

    _ext_laws(Fq12, rand)


def test_frobenius_is_qth_power(rng):
    a = Fq2(Fq.random(rng), Fq.random(rng))
    assert a.frobenius(1) == a ** C.Q
    b = Fq12.from_fq_list([Fq.random(rng) for _ in range(12)])
    assert b.frobenius(1) == b ** C.Q
    assert b.frobenius(2) == b ** (C.Q**2)
    assert b.conjugate() == b ** (C.Q**6)


def test_root_of_unity():
    w = Fr(C.FR_ROOT_OF_UNITY)
    assert w ** (1 << C.FR_S) == Fr.one()
    assert w ** (1 << (C.FR_S - 1)) != Fr.one()


def test_serialization_roundtrip(rng):
    for F in (Fr, Fq):
        a = F.random(rng)
        assert F.from_bytes(a.to_bytes()) == a
        bits = a.to_bits()
        assert len(bits) == 256
        assert sum(bit << (255 - i) for i, bit in enumerate(bits)) == a.v


def test_sqrt(rng):
    for F in (Fr, Fq):
        a = F.random(rng)
        sq = a.square()
        r = sq.sqrt()
        assert r is not None and r.square() == sq

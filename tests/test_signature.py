"""RedDSA signature tests (trait surface: zkstd/src/traits/sign.rs)."""

import random

import pytest

from kogarashi_tpu.pyref.edwards import JUBJUB_SPEC
from kogarashi_tpu.signature import (
    RedDSA,
    SecretKey,
    Signature,
    VerificationKey,
    batch_verify,
)


@pytest.fixture
def keypair(rng):
    return RedDSA().keygen(rng)


def test_sign_verify(rng, keypair):
    sk, vk = keypair
    msg = b"hello kogarashi"
    sig = sk.sign(msg, rng)
    assert vk.verify(msg, sig)
    assert not vk.verify(b"tampered", sig)
    # wrong key
    _, vk2 = RedDSA().keygen(rng)
    assert not vk2.verify(msg, sig)


def test_sig_utils_roundtrip(rng, keypair):
    """SigUtils<L> to_bytes/from_bytes parity surface."""
    sk, vk = keypair
    msg = b"serde"
    sig = sk.sign(msg, rng)
    assert len(sig.to_bytes()) == Signature.LENGTH == 64
    assert len(vk.to_bytes()) == VerificationKey.LENGTH == 32
    sig2 = Signature.from_bytes(sig.to_bytes())
    vk2 = VerificationKey.from_bytes(JUBJUB_SPEC, vk.to_bytes())
    sk2 = SecretKey.from_bytes(JUBJUB_SPEC, sk.to_bytes())
    assert vk2.verify(msg, sig2)
    assert sk2.sk == sk.sk
    # malformed
    assert Signature.from_bytes(b"\x00" * 7) is None
    assert SecretKey.from_bytes(JUBJUB_SPEC, b"\xff" * 32) is None


def test_rerandomization(rng, keypair):
    """Signatures under sk+alpha verify under vk+[alpha]G and only there."""
    sk, vk = keypair
    alpha = rng.randrange(JUBJUB_SPEC.order)
    rsk, rvk = sk.randomize(alpha), vk.randomize(alpha)
    msg = b"rerandomized"
    rsig = rsk.sign(msg, rng)
    assert rvk.verify(msg, rsig)
    assert not vk.verify(msg, rsig)
    # and the randomized vk matches the randomized sk's vk
    assert rsk.verification_key().to_bytes() == rvk.to_bytes()


def test_batch_verify_device(rng):
    """TPU-batched verification: one batched scalar-mul kernel for n sigs."""
    dsa = RedDSA()
    pairs = [dsa.keygen(rng) for _ in range(5)]
    msgs = [f"msg-{i}".encode() for i in range(5)]
    sigs = [sk.sign(m, rng) for (sk, _), m in zip(pairs, msgs)]
    vks = [vk for _, vk in pairs]
    assert batch_verify(vks, msgs, sigs) == [True] * 5
    # flip one message, corrupt one S
    bad_sigs = list(sigs)
    bad_sigs[1] = Signature(sigs[1].r_bytes, (sigs[1].s + 1) % JUBJUB_SPEC.order)
    res = batch_verify(vks, [msgs[0], msgs[1], b"x", msgs[3], msgs[4]], bad_sigs)
    assert res == [True, False, False, True, True]

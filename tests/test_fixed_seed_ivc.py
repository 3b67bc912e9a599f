"""Deterministic fixed-seed IVC vector — mirror of the reference's only
deterministic protocol test (pallet/nova/src/tests.rs:77-104 three_steps_ivc
with the XorShiftRng seed at tests.rs:69-74).

The whole chain — Pedersen key sampling from the XorShift stream, three
prove_steps, pallet-level verify — is deterministic, so the serialized
proof's digest is pinned: any drift in transcript math, folding algebra,
field serialization or rng plumbing fails this test. (The Rust toolchain is
not available in this environment, so the pin is this implementation's
digest, committed as a regression anchor for protocol-level byte stability;
pairing-level bit-exactness vs the reference is pinned separately in
tests/test_reference_kats.py.)
"""

import hashlib

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.nova import ExampleFunction, Ivc, PublicParams
from kogarashi_tpu.pallet.nova_pallet import NovaPallet
from kogarashi_tpu.utils.serde import encode_recursive_proof
from kogarashi_tpu.utils.xorshift import REFERENCE_TEST_SEED, XorShiftRng

# sha256 of the SCALE-encoded 3-step RecursiveProof under the reference seed.
PINNED_PROOF_DIGEST = "efbe9c472ba1798d4ae8fd5a00d29ca33eeffca923a4b01e28dca463f5a66dcd"


@pytest.mark.slow
@pytest.mark.nightly
def test_three_steps_ivc_fixed_seed():
    rng = XorShiftRng.from_seed(REFERENCE_TEST_SEED)
    pp = PublicParams.setup(ExampleFunction, ExampleFunction, rng)
    ivc = Ivc(pp, z0_primary=[0], z0_secondary=[0])
    for _ in range(2):
        ivc.prove_step()
    proof = ivc.prove_step()

    pallet = NovaPallet()
    assert pallet.verify("signed:1", proof, pp)

    blob = encode_recursive_proof(proof)
    digest = hashlib.sha256(blob).hexdigest()
    assert digest == PINNED_PROOF_DIGEST, (
        f"serialized proof drifted: {digest} (update the pin ONLY for an "
        "intentional protocol change)"
    )

"""Full Nova IVC: setup -> init -> prove_step x2 -> verify
(mirrors nova/src tests + pallet/nova/src/tests.rs recursion chain).

One chain only — the augmented circuits are ~77k constraints each and every
step commits several 77k-element vectors, so this is the most expensive test
in the suite (marked slow).
"""

import random

import pytest

from kogarashi_tpu import constants as C
from kogarashi_tpu.nova import ExampleFunction, Ivc, PublicParams


@pytest.mark.slow
@pytest.mark.nightly
def test_ivc_two_steps_and_tamper():
    pp = PublicParams.setup(ExampleFunction, ExampleFunction, random.Random(99))
    ivc = Ivc(pp, z0_primary=[0], z0_secondary=[0])
    proof = ivc.prove_step()  # i: 0 -> 1 (base case, returns immediately)
    assert proof.verify(pp), "base-case proof failed"
    proof = ivc.prove_step()  # first real fold
    assert proof.verify(pp), "step-1 proof failed"

    # state advanced correctly: z_{i+1} = z_i^3 + z_i + 5
    z = 0
    for _ in range(proof.i):
        z = (z**3 + z + 5) % C.R
    assert ivc.zi_primary == [z]

    # tampering is caught
    proof.zi_primary = [(proof.zi_primary[0] + 1) % C.R]
    assert not proof.verify(pp)

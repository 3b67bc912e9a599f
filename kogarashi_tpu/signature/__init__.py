"""RedDSA signatures over twisted Edwards curves (Jubjub).

The reference defines the trait surface only — `SigUtils<L>` byte serde and
the `RedDSA` curve bundle (zkstd/src/traits/sign.rs:6-27) — with Jubjub as
the intended instantiation (zkstd/tests/jubjub.rs). This module provides a
complete, working scheme with those semantics:

  - rerandomizable Schnorr signatures (RedJubjub-style) over the prime-order
    subgroup, with 32-byte compressed points (`SigUtils<32>` parity) and
    64-byte signatures,
  - host-side sign (O(1) — not a TPU workload),
  - TPU-batched verification: all the scalar muls of a signature batch run as
    one batched Edwards scalar-mul kernel (curves/edwards.py).

The challenge hash is Blake2b-512 with a domain-separating personal string,
reduced mod the subgroup order via 64-byte wide reduction — the same
Blake2b + wide-reduction discipline the reference uses for MiMC constant
derivation (nova/src/hash/helper.rs).
"""

from .reddsa import (
    RedDSA,
    SecretKey,
    Signature,
    VerificationKey,
    batch_verify,
)

__all__ = ["RedDSA", "SecretKey", "Signature", "VerificationKey", "batch_verify"]

"""kogarashi_tpu — a TPU-native zkSNARK proving framework.

A from-scratch JAX/XLA/Pallas implementation of the Kogarashi stack:
BN254/Grumpkin field and curve arithmetic, Pippenger MSM, radix-2 NTT,
R1CS constraint system + gadgets, the Groth16 SNARK, and Nova folding/IVC on
the BN254<->Grumpkin cycle — designed for TPU hardware (batched limb
arithmetic on the VPU, sort/scan-formulated bucket accumulation, shard_map
distribution over device meshes) rather than ported from the Rust reference.
"""

__version__ = "0.1.0"

from . import constants

__all__ = ["constants"]

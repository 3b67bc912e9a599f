"""Large-scale Groth16 demonstration on one TPU chip.

BASELINE.md line "Groth16 prove >= 2^20-constraint R1CS": builds the
`SquareChainCircuit` at m = 2^LOG_M constraints (reference pipeline parity:
groth16/src/zksnark.rs:17-127 setup, prover.rs:20-99 prove), runs the full
device setup (fixed-base CRS queries, QAP SpMV, Lagrange idft), one proof
(NTT H-pipeline + 5 Pallas MSMs, all padded onto one 2^LOG_M G1 executable),
verifies it with the 3-pair pairing check, and records wall times in
GROTH16_2POW{LOG_M}.json at the repo root.

Env: KOGARASHI_GROTH16_LOG_M (default 20).

Run: python benches/groth16_large.py
"""

import json
import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from kogarashi_tpu.groth16 import setup
from kogarashi_tpu.r1cs.vector import SquareChainCircuit


def main():
    log_m = int(os.environ.get("KOGARASHI_GROTH16_LOG_M", "20"))
    m = 1 << log_m
    circuit = SquareChainCircuit(m)
    cs_probe = circuit.build()
    print(
        f"# circuit: square chain, m={cs_probe.m} constraints, "
        f"{cs_probe.l() + cs_probe.m_l_1()} wires",
        file=sys.stderr,
    )

    t0 = time.time()
    prover, verifier = setup(circuit, random.Random(0x5E7))
    t_setup = time.time() - t0
    print(f"# setup: {t_setup:.1f}s", file=sys.stderr)

    t0 = time.time()
    proof = prover.create_proof(circuit, random.Random(0xBEEF))
    t_prove = time.time() - t0
    print(f"# prove: {t_prove:.1f}s", file=sys.stderr)

    cs = circuit.build()
    t0 = time.time()
    ok = verifier.verify(proof, cs.x[1:])
    t_verify = time.time() - t0
    assert ok, "proof did not verify"

    # negative check: wrong public output must fail
    bad = list(cs.x[1:])
    bad[-1] = (bad[-1] + 1) % cs.p
    assert not verifier.verify(proof, bad), "tampered inputs verified"

    out = {
        "metric": f"groth16_prove_2^{log_m}_constraints",
        "constraints": m,
        "setup_s": round(t_setup, 2),
        "prove_s": round(t_prove, 2),
        "verify_s": round(t_verify, 2),
        "verified": True,
        "tamper_rejected": True,
        "backend": jax.devices()[0].platform,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / f"GROTH16_2POW{log_m}.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

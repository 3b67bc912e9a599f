"""Nova IVC chain demonstration (BASELINE line "1000-step chain").

Runs PublicParams.setup + an N-step prove_step chain (reference loop:
nova/src/ivc.rs:132; 10-round test verifier.rs:39-66), verifying the
RecursiveProof at the start, middle and end, and records per-step wall
times + steps/s in IVC_CHAIN.json at the repo root.

Env: KOGARASHI_IVC_STEPS (default 10), KOGARASHI_IVC_VERIFY_EVERY (0 = only
checkpoints).

Run: python benches/ivc_chain.py
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

from kogarashi_tpu import constants as C
from kogarashi_tpu.nova import ExampleFunction, Ivc, PublicParams


def main():
    n_steps = int(os.environ.get("KOGARASHI_IVC_STEPS", "10"))
    verify_every = int(os.environ.get("KOGARASHI_IVC_VERIFY_EVERY", "0"))

    t0 = time.time()
    pp = PublicParams.setup(ExampleFunction, ExampleFunction, random.Random(99))
    t_setup = time.time() - t0
    print(f"# setup {t_setup:.1f}s", file=sys.stderr)

    ivc = Ivc(pp, z0_primary=[0], z0_secondary=[0])
    step_times = []
    proof = None
    t_chain0 = time.time()
    for s in range(n_steps):
        t0 = time.time()
        proof = ivc.prove_step()
        dt = time.time() - t0
        step_times.append(dt)
        if s < 3 or (s + 1) % 25 == 0:
            print(f"# step {s + 1}/{n_steps}: {dt:.1f}s", file=sys.stderr)
        if verify_every and (s + 1) % verify_every == 0:
            assert proof.verify(pp), f"proof failed at step {s + 1}"
    t_chain = time.time() - t_chain0

    assert proof.verify(pp), "final proof failed"
    # state correctness: z_{i+1} = z_i^3 + z_i + 5 from z_0 = 0
    z = 0
    for _ in range(proof.i):
        z = (z**3 + z + 5) % C.R
    assert ivc.zi_primary == [z], "chain state drifted"

    # tamper check
    proof.zi_primary = [(proof.zi_primary[0] + 1) % C.R]
    assert not proof.verify(pp), "tampered proof verified"

    steady = step_times[2:] or step_times  # skip base case + first fold
    out = {
        "metric": "nova_ivc_chain",
        "steps": n_steps,
        "setup_s": round(t_setup, 2),
        "chain_s": round(t_chain, 2),
        "steps_per_s": round(n_steps / t_chain, 4),
        "steady_step_s": round(sum(steady) / len(steady), 2),
        "final_verified": True,
        "tamper_rejected": True,
        "backend": jax.devices()[0].platform,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "IVC_CHAIN.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

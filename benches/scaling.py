"""Scaling-efficiency harness (BASELINE line 2).

Runs the distributed MSM and distributed NTT over 1/2/4/8-device meshes and
reports wall times + efficiency vs 1 device, writing SCALING_r<N>.json.

Honest caveat, recorded in the JSON: this box exposes ONE physical TPU chip;
multi-device runs here use the virtual CPU mesh
(--xla_force_host_platform_device_count=8), whose "devices" share the same
host cores. Virtual-mesh numbers therefore validate the sharding/collective
STRUCTURE (correct results, bounded collective overhead), not real-hardware
speedup; per-chip TPU throughput comes from bench.py on the real chip.

Usage: python benches/scaling.py [--out SCALING_rNN.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--log-n-msm", type=int, default=14)
    ap.add_argument("--log-n-ntt", type=int, default=16)
    args = ap.parse_args()

    import random

    from kogarashi_tpu import constants as C
    from kogarashi_tpu.curves import G1
    from kogarashi_tpu.fields import FR_OPS
    from kogarashi_tpu.fields.spec import ints_to_limbs
    from kogarashi_tpu.parallel.msm import make_mesh
    from kogarashi_tpu.parallel.ntt import DistributedDomain

    from functools import partial

    from kogarashi_tpu.ops.msm_pallas import prepare_points
    from kogarashi_tpu.parallel.msm import distributed_msm_pallas

    rng = random.Random(11)
    n = 1 << args.log_n_msm
    g = G1.pyref_spec.generator
    x64, y64, inf64, gen = prepare_points(
        G1, [rng.randrange(1, C.R) * g for _ in range(64)]
    )
    x = jnp.tile(x64, (n // 64, 1))
    y = jnp.tile(y64, (n // 64, 1))
    inf = jnp.tile(inf64, (n // 64,))
    sc = np.random.default_rng(3).integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    sc[15] &= 0x3FFF
    sc = jnp.asarray(sc)

    nk = 1 << args.log_n_ntt
    coeffs = jnp.asarray(
        np.random.default_rng(5).integers(0, 1 << 16, size=(16, nk), dtype=np.uint32)
    )
    coeffs = coeffs.at[15].set(coeffs[15] & 0x3FF)

    from kogarashi_tpu.ops.msm_pallas import decode_point

    counts = [1, 2, 4, 8]
    msm_t, ntt_t = {}, {}
    ref_point = None
    for d in counts:
        mesh = make_mesh(d)
        fn = jax.jit(
            partial(
                distributed_msm_pallas, G1, gen_xy=gen, mesh=mesh, c=12, mode="xla"
            )
        )
        t = timeit(fn, x, y, inf, sc, reps=2)
        out = fn(x, y, inf, sc)
        pt = decode_point(G1, tuple(c_[..., 0:1] for c_ in out))[0]
        if ref_point is None:
            ref_point = pt
        assert pt == ref_point, f"distributed MSM result drift at d={d}"
        msm_t[d] = t

        dom = DistributedDomain(args.log_n_ntt, mesh)
        fN = jax.jit(lambda a, dom=dom: dom.dft(dom.scatter_input(a)))
        t = timeit(fN, coeffs)
        ntt_t[d] = t

    result = {
        "round": 5,
        "engine": "ops/msm_pallas (flagship 13-bit sort/scan Pippenger, xla executor)",
        "hardware": "virtual 8-device CPU mesh (single physical TPU chip on this box)",
        "caveat": (
            "virtual-mesh devices share host cores, so the ideal multi-device "
            "wall time is FLAT (work conservation), not 1/D: "
            "work_conservation = t_1dev / t_Ddev, ideal 1.0. Values near 1 "
            "mean sharding adds no extra total work or collective overhead; "
            "real-hardware speedup needs real chips (see bench.py for 1-chip)"
        ),
        "msm": {
            "log_n": args.log_n_msm,
            "times_s": {str(d): msm_t[d] for d in counts},
            "work_conservation_vs_1dev": {
                str(d): msm_t[1] / msm_t[d] for d in counts
            },
            "result_parity": True,
        },
        "ntt": {
            "log_n": args.log_n_ntt,
            "times_s": {str(d): ntt_t[d] for d in counts},
            "work_conservation_vs_1dev": {
                str(d): ntt_t[1] / ntt_t[d] for d in counts
            },
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Headline benchmark: BN254 G1 MSM throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Target (BASELINE.md): >= 1e8 point-adds/s/chip at 2^20 points, where
point-adds = n * ceil(256/c) bucket-accumulation additions of standard
Pippenger (the conventional MSM throughput accounting).

Env overrides: KOGARASHI_BENCH_LOG_N (default 20), KOGARASHI_BENCH_C,
KOGARASHI_BENCH_REPS (default 3).
"""

import json
import os
import random
import sys
import time


def main():
    log_n = int(os.environ.get("KOGARASHI_BENCH_LOG_N", "20"))
    reps = int(os.environ.get("KOGARASHI_BENCH_REPS", "3"))
    n = 1 << log_n

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from kogarashi_tpu.curves import G1
    from kogarashi_tpu.ops.msm import default_window, msm_jit
    from kogarashi_tpu.fields.spec import N_LIMBS

    c = int(os.environ.get("KOGARASHI_BENCH_C", str(default_window(n))))
    n_windows = -(-256 // c)

    # points: small random base set tiled to n (distribution-independent
    # throughput measurement); scalars: uniform 254-bit
    rng = random.Random(0xBE7C4)
    g = G1.pyref_spec.generator
    base = G1.encode_points([rng.randrange(1, 2**128) * g for _ in range(64)])
    reps_tile = n // 64
    points = tuple(jnp.tile(c_, (1,) * (c_.ndim - 1) + (reps_tile,)) for c_ in base)

    rng_np = np.random.default_rng(1)
    scalars = jnp.asarray(
        rng_np.integers(0, 1 << 16, size=(N_LIMBS, n), dtype=np.uint32)
    )
    # clamp to < r: zero the top two bits of the top limb
    scalars = scalars.at[N_LIMBS - 1].set(scalars[N_LIMBS - 1] & 0x3FFF)

    fn = msm_jit(G1.cfg, c=c)
    t0 = time.time()
    out = fn(points, scalars)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(points, scalars)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)

    point_adds = n * n_windows
    value = point_adds / best
    result = {
        "metric": f"bn254_g1_msm_point_adds_per_s_2^{log_n}",
        "value": value,
        "unit": "point-adds/s/chip",
        "vs_baseline": value / 1e8,
    }
    print(json.dumps(result))
    print(
        f"# n=2^{log_n} c={c} windows={n_windows} best={best:.3f}s "
        f"times={['%.3f' % t for t in times]} first(compile)={compile_and_first:.1f}s "
        f"backend={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

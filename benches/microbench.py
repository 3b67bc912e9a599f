"""Micro-benchmark matrix — parity with the reference's criterion harnesses
(bn254/benches/bn_254_{field,curve}.rs, grumpkin/benches/grumpkin_curve.rs),
plus the TPU-only kernels (MSM, NTT) and the native host runtime.

Prints one JSON line per metric:
  {"bench": "...", "value": N, "unit": "..."}

Usage: python benches/microbench.py [--batch 65536] [--cpu]
The driver's TPU env runs this as-is; --cpu forces the host backend.
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    """Median wall time of fn(*args), host-materialising every output leaf
    inside the timed region (block_until_ready alone proved to be an
    unreliable clock on the axon platform — see VERDICT r1/r2)."""
    import jax
    import numpy as np

    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def emit(bench, value, unit):
    print(json.dumps({"bench": bench, "value": value, "unit": unit}), flush=True)


def field_benches(batch):
    import jax.numpy as jnp
    import numpy as np

    from kogarashi_tpu.fields import FQ_OPS, FR_OPS

    rng = np.random.default_rng(0)
    for f in (FR_OPS, FQ_OPS):
        name = f.spec.name
        # random canonical-ish inputs: encode random ints
        vals = [random.Random(1).randrange(f.spec.p) for _ in range(256)]
        a = jnp.tile(f.encode(vals), (1, batch // 256))
        b = jnp.roll(a, 1, axis=1)
        for op_name, op in (
            ("add", f.add), ("sub", f.sub), ("mul", f.mul), ("square", f.square),
        ):
            t = timeit(op, a, b) if op_name in ("add", "sub", "mul") else timeit(op, a)
            emit(f"{name}/{op_name}", batch / t, "elems/s")
        # inversion is ~500 muls; bench at 1/16 batch
        small = a[:, : batch // 16]
        t = timeit(f.inv, small)
        emit(f"{name}/invert", small.shape[1] / t, "elems/s")


def curve_benches(batch):
    import jax.numpy as jnp

    from kogarashi_tpu.curves import G1, G2, GRUMPKIN
    from kogarashi_tpu.curves.edwards import JUBJUB
    from kogarashi_tpu.fields.spec import ints_to_limbs

    rng = random.Random(2)
    for curve, name in ((G1, "g1"), (GRUMPKIN, "grumpkin"), (G2, "g2"), (JUBJUB, "jubjub")):
        n = batch // (4 if name == "g2" else 1)
        g = curve.pyref_spec.generator
        base = curve.encode_points([(rng.randrange(2, 2**63) * _ext(g)) for _ in range(16)]
                                   if name == "jubjub" else
                                   [rng.randrange(2, 2**63) * g for _ in range(16)])
        pts = _tile_point(base, n // 16)
        t = timeit(curve.add, pts, pts)
        emit(f"{name}/add", n / t, "points/s")
        t = timeit(curve.double, pts)
        emit(f"{name}/double", n / t, "points/s")
        # scalar mul: much heavier — small batch
        ns = max(n // 256, 16)
        sc = jnp.asarray(ints_to_limbs([rng.randrange(2**254) for _ in range(ns)]).T)
        small = _tile_point(base, ns // 16)
        t = timeit(curve.scalar_mul, small, sc)
        emit(f"{name}/scalar_mul", ns / t, "points/s")


def _ext(g):
    return g.to_extended() if hasattr(g, "to_extended") else g


def _tile_point(p, reps):
    import jax.numpy as jnp

    return tuple(jnp.tile(c, (1,) * (c.ndim - 1) + (reps,)) for c in p)


def msm_ntt_benches(batch):
    import jax.numpy as jnp
    import numpy as np

    from kogarashi_tpu.curves import G1
    from kogarashi_tpu.fields import FR_OPS
    from kogarashi_tpu.ops.msm import default_window, msm_jit
    from kogarashi_tpu.ops.ntt import Domain

    rng = random.Random(3)
    n = batch
    g = G1.pyref_spec.generator
    base = G1.encode_points([rng.randrange(1, 2**128) * g for _ in range(64)])
    pts = _tile_point(base, n // 64)
    sc = np.random.default_rng(4).integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    sc[15] &= 0x3FFF
    sc = jnp.asarray(sc)
    c = default_window(n)
    fn = msm_jit(G1.cfg, c)
    t = timeit(fn, pts, sc)
    emit("msm/g1", n / t, "points/s")

    k = max(10, min(16, n.bit_length() - 1))
    dom = Domain(k, FR_OPS.spec)
    coeffs = jnp.asarray(FR_OPS.spec.encode(
        [rng.randrange(FR_OPS.spec.p) for _ in range(1 << k)]).T)
    import jax
    dft = jax.jit(dom.dft)
    t = timeit(dft, coeffs)
    emit(f"ntt/fr_2^{k}", (1 << k) / t, "elems/s")


def native_benches():
    from kogarashi_tpu import constants as C
    from kogarashi_tpu import native as N
    from kogarashi_tpu.pyref.field import Fr
    from kogarashi_tpu.pyref.mimc import mimc_constants

    if not N.available():
        return
    rng = random.Random(5)
    p = C.R
    cts = [c.v for c in mimc_constants(Fr)]
    state = [rng.randrange(p) for _ in range(512)]
    t0 = time.perf_counter()
    N.mimc_sponge(state, cts, p)
    t = time.perf_counter() - t0
    emit("native/mimc_absorb", len(state) / t, "elems/s")

    n = 1 << 14
    indptr = list(range(0, 5 * n + 1, 5))
    indices = [rng.randrange(n) for _ in range(5 * n)]
    data = [rng.randrange(p) for _ in range(5 * n)]
    z = [rng.randrange(p) for _ in range(n)]
    csr = N.CSR(indptr, indices, data, p)
    csr.mv(z)
    t0 = time.perf_counter()
    csr.mv(z)
    t = time.perf_counter() - t0
    emit("native/spmv", 5 * n / t, "nnz/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1 << 16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", choices=["field", "curve", "msm", "native"], default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    emit("backend", 0, jax.devices()[0].platform)

    if args.only in (None, "field"):
        field_benches(args.batch)
    if args.only in (None, "curve"):
        curve_benches(args.batch)
    if args.only in (None, "msm"):
        msm_ntt_benches(args.batch)
    if args.only in (None, "native"):
        native_benches()


if __name__ == "__main__":
    main()

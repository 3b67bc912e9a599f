"""Windowed fixed-base batch scalar multiplication.

The reference generates Groth16 CRS queries with one naive double-and-add
per wire (zksnark.rs:162-193 -> points/weierstrass.rs:167 scalar_point): 256
sequential point ops per element. On TPU that serializes a 2^20-lane batch
behind a 256-deep scan. Here the base is FIXED (the curve generator), so we
precompute T[w][d] = d * 2^(c*w) * G once per curve and evaluate

    [k] G = sum_w T[w][digit_w(k)]

as W-1 batched complete adds over gathered table rows — depth ~32 instead of
512 for c=8, with every step a full-width vector op.

Works for any curve algebra (G1, Grumpkin base fields; G2 over Fq2).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..curves import point as P
from ..curves.point import CurveCfg


class FixedBaseTable:
    """Precomputed window table for [k]G over a curve's generator.

    table coords: algebra arrays with trailing axis W * 2^c; entry
    w * 2^c + d holds d * 2^(c*w) * G (entry d=0 is junk — masked to the
    identity at lookup time).
    """

    def __init__(self, curve, c: int = 8, bits: int = 256):
        assert 1 <= c <= 16, "digit extraction merges at most one extra limb"
        self.curve = curve
        self.c = c
        self.n_windows = -(-bits // c)
        spec = curve.pyref_spec
        from ..pyref.curve import ProjectivePoint, batch_to_affine

        g = spec.generator
        base = ProjectivePoint(spec, g.x, g.y, spec.field_one())
        entries = []
        for w in range(self.n_windows):
            acc = spec.identity_projective()
            entries.append(acc)  # d = 0 placeholder (masked at lookup)
            for d in range(1, 1 << c):
                acc = acc + base  # projective adds: no per-entry inversion
                entries.append(acc)
            for _ in range(c):
                base = base.double()
        # one shared inversion for the whole table
        self.points = curve.encode_points(batch_to_affine(entries))
        import jax

        self._mul_jit = jax.jit(self._mul)

    def mul(self, std_scalars):
        """[k_i] G for device standard-form limbs (16, n) -> projective batch."""
        return self._mul_jit(std_scalars)

    def _mul(self, std_scalars):
        cfg = self.curve.cfg
        a = cfg.alg
        c = self.c
        mask = jnp.uint32((1 << c) - 1)
        n = std_scalars.shape[-1]
        acc = None
        for w in range(self.n_windows):
            bitpos = w * c
            limb, shift = bitpos // 16, bitpos % 16
            raw = std_scalars[limb] >> shift
            if shift and c + shift > 16 and limb + 1 < std_scalars.shape[0]:
                raw = raw | (std_scalars[limb + 1] << (16 - shift))
            d = (raw & mask).astype(jnp.int32)
            idx = d + (w << c)
            pt = tuple(jnp.take(coords, idx, axis=-1) for coords in self.points)
            pt = P.pselect(cfg, d == 0, P.identity(cfg, (n,)), pt)
            acc = pt if acc is None else P.padd(cfg, acc, pt)
        return acc


@lru_cache(maxsize=8)
def _table(curve_name: str, c: int):
    from ..curves import G1, G2, GRUMPKIN

    curve = {"g1": G1, "g2": G2, "grumpkin": GRUMPKIN}[curve_name]
    return FixedBaseTable(curve, c=c)


def fixed_base_mul(curve, std_scalars, c: int = 8, chunk: int = 1 << 17):
    """[k_i] G for (16, n) standard-form device limbs over `curve`'s generator.

    Processed in <= `chunk`-wide pieces: the windowed evaluation holds
    ~n_windows live (16, n) buffers, which at 2^20 scalars exceeds HBM."""
    import jax.numpy as jnp

    t = _table(curve.cfg.name, c)
    n = std_scalars.shape[-1]
    if n <= chunk:
        return t.mul(std_scalars)
    if n % chunk:  # pad the tail chunk to a uniform shape: one compile total
        std_scalars = jnp.pad(std_scalars, ((0, 0), (0, chunk - n % chunk)))
    parts = [
        t.mul(std_scalars[..., i : i + chunk])
        for i in range(0, std_scalars.shape[-1], chunk)
    ]
    return tuple(
        jnp.concatenate([p[k] for p in parts], axis=-1)[..., :n] for k in range(3)
    )

"""Pedersen vector commitment (parity: nova/src/pedersen.rs).

Key = 2^k + 1 random affine points; commit(m) = sum m_i * g_i. The reference
samples keys as random-scalar multiples of the generator and commits with a
naive per-element loop. Here:
  - key points are sampled by rejection on random x-coordinates (uniform on
    the curve; valid because G1/Grumpkin have cofactor 1) — two modular pows
    per candidate instead of a full scalar multiplication;
  - only the first `active` points are materialized (messages are shorter
    than 2^k+1; the tail would multiply zero scalars);
  - the commitment *is* a device MSM over the limb-major point batch, padded
    to the fixed active length so every commit shares one compiled executable.
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

from ..curves import G1 as G1_DEV, GRUMPKIN as GRUMPKIN_DEV
from ..fields.spec import ints_to_limbs
from ..ops.convert import g1_queries_to_rows
from ..ops.msm_pallas import curve_k, decode_point, msm_pallas, prepare_points
from ..pyref.curve import AffinePoint


def _device_curve(spec):
    return {"G1": G1_DEV, "Grumpkin": GRUMPKIN_DEV}[spec.name]


def _sqrt_mod(a: int, p: int, g: int, s: int, t: int):
    """sqrt mod p or None (raw ints; Tonelli-Shanks for p % 4 == 1)."""
    if a == 0:
        return 0
    if p % 4 == 3:
        y = pow(a, (p + 1) // 4, p)
        return y if y * y % p == a else None
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    m, c = s, pow(g, t, p)
    tt, r = pow(a, t, p), pow(a, (t + 1) // 2, p)
    while tt != 1:
        i, tmp = 0, tt
        while tmp != 1:
            tmp = tmp * tmp % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        tt, r = tt * c % p, r * b % p
    return r


def random_curve_point(spec, rng) -> AffinePoint:
    """Uniform random point via x-rejection (cofactor-1 curves only)."""
    F = spec.field
    p, b = F.p, spec.b.v
    while True:
        x = rng.randrange(p)
        y = _sqrt_mod((x * x % p * x + b) % p, p, F.generator, F.s, F.t)
        if y is None:
            continue
        if rng.randrange(2):
            y = p - y
        return AffinePoint(spec, F(x), F(y), False)


class PedersenCommitment:
    def __init__(self, curve_spec, k: int, rng, active: int | None = None):
        """curve_spec: pyref CurveSpec. Key is logically 2^k + 1 points;
        `active` bounds how many are materialized (max message length).

        Two sampling modes:
          * `random.Random`: uniform x-rejection sampling (fast host path;
            same distribution, different stream).
          * `XorShiftRng` (utils/xorshift.py): the reference's exact stream —
            generator * Fr::random(rng) per point, all 2^k + 1 samples drawn
            (pedersen.rs:10-13), points materialized as one device batched
            fixed-base scalar-mul instead of a host loop per point."""
        self.spec = curve_spec
        self.curve = _device_curve(curve_spec)
        self.key_len = (1 << k) + 1
        n = min(active, self.key_len) if active is not None else self.key_len
        self.n_active = n
        if hasattr(rng, "field_random"):  # reference-stream mode
            from ..constants import Q, R
            from ..ops.fixed_base import fixed_base_mul

            order = {"G1": R, "Grumpkin": Q}[curve_spec.name]
            scalars = [rng.field_random(order) for _ in range(self.key_len)]
            s_dev = jnp.asarray(ints_to_limbs(scalars[:n]).T)
            g_proj = fixed_base_mul(self.curve, s_dev)
            self._rows = g1_queries_to_rows(self.curve, g_proj)
            self._g_list = None
        else:
            self._g_list = [random_curve_point(curve_spec, rng) for _ in range(n)]
            self._rows = prepare_points(self.curve, self._g_list)
        self._ck = curve_k(self.curve)
        self._mode = "xla" if jax.devices()[0].platform == "cpu" else "pallas"
        if self._mode == "pallas":
            # one jitted executable per key: keeps the whole MSM inside XLA
            # (eager pallas dispatch on the axon backend leaks host buffers)
            from functools import partial

            x, y, inf, gen = self._rows
            self._commit_jit = jax.jit(
                partial(msm_pallas, self._ck, x, y, inf, gen_xy=gen, mode="pallas")
            )
        else:
            self._commit_jit = None

    @property
    def g(self):
        """Key points as pyref affine (decoded lazily from the device rows)."""
        if self._g_list is None:
            import numpy as np

            from ..fields import mont_pallas as M

            x, y, inf, _ = self._rows
            one_col = jnp.asarray(
                np.array(
                    M.limbs13(self._ck.K.mont_r % self._ck.K.p, self._ck.K.n),
                    np.int32,
                )
            )[:, None]
            z = jnp.where(jnp.asarray(np.asarray(inf))[None], 0, one_col)
            self._g_list = decode_point(
                self.curve, (jnp.transpose(x), jnp.transpose(y), z)
            )
        return self._g_list

    def commit(self, m: list):
        """sum m_i g_i -> pyref AffinePoint (Pallas MSM over the key rows)."""
        n = self.n_active
        assert len(m) <= n, "message longer than materialized commitment key"
        scalars = list(m) + [0] * (n - len(m))
        s_dev = jnp.asarray(ints_to_limbs(scalars).T)
        if self._commit_jit is not None:
            out = self._commit_jit(s_dev)
        else:
            x, y, inf, gen = self._rows
            out = msm_pallas(self._ck, x, y, inf, s_dev, gen_xy=gen, mode=self._mode)
        return decode_point(self.curve, out)[0]

    def commit_host(self, m: list):
        """Naive host commit (oracle/cross-check)."""
        acc = self.spec.identity_affine()
        for v, g in zip(m, self.g):
            acc = acc + v * g
        return acc

"""Batched TPU curve kernels for BN254 G1/G2 and Grumpkin.

`G1`, `G2`, `GRUMPKIN` are `Curve` instances: jitted batched projective ops
over limb-major coefficient arrays, plus host-side conversion to/from the
pyref oracle points.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..fields.spec import FQ as FQ_SPEC, FR as FR_SPEC, N_LIMBS
from .algebra import BaseAlg, Fq2Alg
from . import point as P
from .point import CurveCfg


class Curve:
    """Spec-bound, jitted batched curve ops. Points are (x, y, z) pytrees."""

    def __init__(self, cfg: CurveCfg, pyref_spec):
        self.cfg = cfg
        self.pyref_spec = pyref_spec
        self.add = jax.jit(partial(P.padd, cfg))
        self.double = jax.jit(partial(P.pdouble, cfg))
        self.neg = jax.jit(partial(P.pneg, cfg))
        self.scalar_mul = jax.jit(partial(P.scalar_mul, cfg))
        self.to_affine = jax.jit(partial(P.to_affine, cfg))
        self.on_curve = jax.jit(partial(P.on_curve, cfg))

    def identity(self, batch=()):
        return P.identity(self.cfg, batch)

    def generator(self, batch_ndim: int = 0):
        return P.generator(self.cfg, batch_ndim)

    # -- host conversions (oracle <-> device) ------------------------------
    def _enc_coord(self, vals):
        """List of coefficient values -> device array (limb-major, Montgomery)."""
        alg = self.cfg.alg
        if alg.ext_degree == 1:
            return jnp.asarray(alg.spec.encode([v.v for v in vals]).T)
        c0 = alg.spec.encode([v.c0.v for v in vals]).T
        c1 = alg.spec.encode([v.c1.v for v in vals]).T
        return jnp.stack([jnp.asarray(c0), jnp.asarray(c1)])

    def encode_points(self, pts):
        """pyref AffinePoints -> batched projective device point (batch=len)."""
        xs = self._enc_coord([p.x for p in pts])
        ys = self._enc_coord([p.y for p in pts])
        inf = jnp.asarray(np.array([p.is_infinity for p in pts], dtype=bool))
        return P.from_affine(self.cfg, xs, ys, inf)

    def _dec_coord(self, arr, i):
        alg = self.cfg.alg
        F = self.pyref_spec.field
        if alg.ext_degree == 1:
            v = alg.spec.decode(np.asarray(arr).T)[i]
            return F(v)
        from ..pyref import Fq, Fq2

        c0 = alg.spec.decode(np.asarray(arr[0]).T)[i]
        c1 = alg.spec.decode(np.asarray(arr[1]).T)[i]
        return Fq2(Fq(c0), Fq(c1))

    def decode_points(self, p):
        """Batched projective device point -> list of pyref AffinePoints."""
        ax, ay, inf = self.to_affine(p)
        inf = np.asarray(inf)
        out = []
        for i in range(inf.shape[0]):
            if inf[i]:
                out.append(self.pyref_spec.identity_affine())
            else:
                out.append(
                    type(self.pyref_spec.generator)(
                        self.pyref_spec, self._dec_coord(ax, i), self._dec_coord(ay, i), False
                    )
                )
        return out


def _mk_curves():
    from ..pyref import G1_SPEC, G2_SPEC, GRUMPKIN_SPEC

    g1 = Curve(
        CurveCfg(
            name="g1",
            alg=BaseAlg(FQ_SPEC),
            b3=3 * C.G1_B % C.Q,
            scalar_spec=FR_SPEC,
            generator=C.G1_GEN,
        ),
        G1_SPEC,
    )
    grumpkin = Curve(
        CurveCfg(
            name="grumpkin",
            alg=BaseAlg(FR_SPEC),
            b3=3 * C.GRUMPKIN_B % C.R,
            scalar_spec=FQ_SPEC,
            generator=C.GRUMPKIN_GEN,
        ),
        GRUMPKIN_SPEC,
    )
    g2 = Curve(
        CurveCfg(
            name="g2",
            alg=Fq2Alg(FQ_SPEC),
            b3=(3 * C.G2_B[0] % C.Q, 3 * C.G2_B[1] % C.Q),
            scalar_spec=FR_SPEC,
            generator=(C.G2_GEN_X, C.G2_GEN_Y),
        ),
        G2_SPEC,
    )
    return g1, g2, grumpkin


G1, G2, GRUMPKIN = _mk_curves()

__all__ = ["Curve", "CurveCfg", "G1", "G2", "GRUMPKIN", "BaseAlg", "Fq2Alg"]

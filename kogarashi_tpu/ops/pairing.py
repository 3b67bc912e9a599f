"""Device (JAX) Fq2/Fq6/Fq12 tower and optimal-ate pairing.

Parity: bn254/src/fqn.rs (tower ops, mul_by_034, frobenius, final_exp),
bn254/src/pairing.rs (NAF Miller loop). Line coefficients are precomputed on
host (pyref G2Prepared — O(1) Fq2 work per pairing) and shipped as stacked
arrays; the device loop consumes them under one `lax.scan` with a
square-or-not flag per fold, then runs the final exponentiation as a
scan over the (static) hard-part exponent bits.

Element layouts (uint32 limb-major):
  Fq2:  (2, 16, *batch)      Fq6: (3, 2, 16, *batch)   Fq12: (2, 3, 2, 16, *batch)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..fields import mont
from ..fields.spec import FQ as FQ_SPEC, N_LIMBS
from ..pyref import Fq, Fq2, Fq6, Fq12
from ..pyref.pairing_fast import (
    G2Prepared,
    HARD_PART_EXP,
    SIX_U_PLUS_2_NAF,
)
from ..pyref.tower import FROB_FQ6_C1, FROB_FQ6_C2, FROB_FQ12_C1

S = FQ_SPEC
U32 = jnp.uint32

# ---------------------------------------------------------------------------
# Fq / Fq2 primitives
# ---------------------------------------------------------------------------

_add = partial(mont.add, spec=S)
_sub = partial(mont.sub, spec=S)
_neg = partial(mont.neg, spec=S)
_mul = partial(mont.mont_mul, spec=S)
_inv = partial(mont.inv, spec=S)


def f2(c0, c1):
    return jnp.stack([c0, c1])


def f2_add(a, b):
    return jnp.stack([_add(a[0], b[0]), _add(a[1], b[1])])


def f2_sub(a, b):
    return jnp.stack([_sub(a[0], b[0]), _sub(a[1], b[1])])


def f2_neg(a):
    return jnp.stack([_neg(a[0]), _neg(a[1])])


def f2_dbl(a):
    return f2_add(a, a)


def f2_mul(a, b):
    m0 = _mul(a[0], b[0])
    m1 = _mul(a[1], b[1])
    m2 = _mul(_add(a[0], a[1]), _add(b[0], b[1]))
    return jnp.stack([_sub(m0, m1), _sub(_sub(m2, m0), m1)])


def f2_sq(a):
    c0 = _mul(_add(a[0], a[1]), _sub(a[0], a[1]))
    c1 = _add(_mul(a[0], a[1]), _mul(a[0], a[1]))
    return jnp.stack([c0, c1])


def f2_conj(a):
    return jnp.stack([a[0], _neg(a[1])])


def f2_mul_xi(a):
    """* (9 + u): (9a0 - a1, 9a1 + a0)."""
    nine0 = _x9(a[0])
    nine1 = _x9(a[1])
    return jnp.stack([_sub(nine0, a[1]), _add(nine1, a[0])])


def _x9(x):
    x2 = _add(x, x)
    x4 = _add(x2, x2)
    x8 = _add(x4, x4)
    return _add(x8, x)


def f2_inv(a):
    n = _inv(_add(_mul(a[0], a[0]), _mul(a[1], a[1])))
    return jnp.stack([_mul(a[0], n), _neg(_mul(a[1], n))])


# ---------------------------------------------------------------------------
# Fq6
# ---------------------------------------------------------------------------


def f6(c0, c1, c2):
    return jnp.stack([c0, c1, c2])


def f6_add(a, b):
    return jnp.stack([f2_add(a[i], b[i]) for i in range(3)])


def f6_sub(a, b):
    return jnp.stack([f2_sub(a[i], b[i]) for i in range(3)])


def f6_neg(a):
    return jnp.stack([f2_neg(a[i]) for i in range(3)])


def f6_mul(a, b):
    t0, t1, t2 = f2_mul(a[0], b[0]), f2_mul(a[1], b[1]), f2_mul(a[2], b[2])
    c0 = f2_add(
        t0,
        f2_mul_xi(
            f2_sub(
                f2_sub(f2_mul(f2_add(a[1], a[2]), f2_add(b[1], b[2])), t1), t2
            )
        ),
    )
    c1 = f2_add(
        f2_sub(f2_sub(f2_mul(f2_add(a[0], a[1]), f2_add(b[0], b[1])), t0), t1),
        f2_mul_xi(t2),
    )
    c2 = f2_add(
        f2_sub(f2_sub(f2_mul(f2_add(a[0], a[2]), f2_add(b[0], b[2])), t0), t2), t1
    )
    return jnp.stack([c0, c1, c2])


def f6_mul_nonres(a):
    """* v: (xi*c2, c0, c1)."""
    return jnp.stack([f2_mul_xi(a[2]), a[0], a[1]])


def f6_mul_by_01(a, b0, b1):
    t0, t1 = f2_mul(a[0], b0), f2_mul(a[1], b1)
    c0 = f2_add(f2_mul_xi(f2_sub(f2_mul(f2_add(a[1], a[2]), b1), t1)), t0)
    c2 = f2_add(f2_sub(f2_mul(f2_add(a[0], a[2]), b0), t0), t1)
    c1 = f2_sub(f2_sub(f2_mul(f2_add(a[0], a[1]), f2_add(b0, b1)), t0), t1)
    return jnp.stack([c0, c1, c2])


def f6_inv(a):
    t0 = f2_sub(f2_sq(a[0]), f2_mul_xi(f2_mul(a[1], a[2])))
    t1 = f2_sub(f2_mul_xi(f2_sq(a[2])), f2_mul(a[0], a[1]))
    t2 = f2_sub(f2_sq(a[1]), f2_mul(a[0], a[2]))
    d = f2_inv(
        f2_add(
            f2_mul(a[0], t0),
            f2_mul_xi(f2_add(f2_mul(a[2], t1), f2_mul(a[1], t2))),
        )
    )
    return jnp.stack([f2_mul(t0, d), f2_mul(t1, d), f2_mul(t2, d)])


# ---------------------------------------------------------------------------
# Fq12
# ---------------------------------------------------------------------------


def f12(c0, c1):
    return jnp.stack([c0, c1])


def f12_one(batch=()):
    one2 = jnp.stack([mont.ones(batch, S), mont.zeros(batch, S)])
    zero2 = jnp.stack([mont.zeros(batch, S), mont.zeros(batch, S)])
    return jnp.stack(
        [jnp.stack([one2, zero2, zero2]), jnp.stack([zero2, zero2, zero2])]
    )


def f12_mul(a, b):
    t0 = f6_mul(a[0], b[0])
    t1 = f6_mul(a[1], b[1])
    c0 = f6_add(t0, f6_mul_nonres(t1))
    c1 = f6_sub(f6_sub(f6_mul(f6_add(a[0], a[1]), f6_add(b[0], b[1])), t0), t1)
    return jnp.stack([c0, c1])


def f12_sq(a):
    t = f6_mul(a[0], a[1])
    c0 = f6_sub(
        f6_sub(f6_mul(f6_add(a[0], a[1]), f6_add(a[0], f6_mul_nonres(a[1]))), t),
        f6_mul_nonres(t),
    )
    return jnp.stack([c0, f6_add(t, t)])


def f12_conj(a):
    return jnp.stack([a[0], f6_neg(a[1])])


def f12_inv(a):
    d = f6_inv(f6_sub(f6_mul(a[0], a[0]), f6_mul_nonres(f6_mul(a[1], a[1]))))
    return jnp.stack([f6_mul(a[0], d), f6_neg(f6_mul(a[1], d))])


def f12_mul_by_034(a, c0, c3, c4):
    """Sparse line multiply (fqn.rs:570)."""
    t0 = jnp.stack([f2_mul(a[0][i], c0) for i in range(3)])
    t1 = f6_mul_by_01(a[1], c3, c4)
    o = f2_add(c0, c3)
    t2 = f6_mul_by_01(f6_add(a[0], a[1]), o, c4)
    out0 = f6_add(f6_mul_nonres(t1), t0)
    out1 = f6_sub(f6_sub(t2, t0), t1)
    return jnp.stack([out0, out1])


def _enc_fq2_const(v: Fq2, batch_ndim: int):
    return jnp.stack(
        [
            mont.const(v.c0.v, S, batch_ndim),
            mont.const(v.c1.v, S, batch_ndim),
        ]
    )


def f12_frobenius(a, power: int):
    """x -> x^(q^power) with precomputed coefficient tables."""
    nb = a.ndim - 4
    if power % 2 == 0:
        conj2 = lambda x: x
    else:
        conj2 = f2_conj

    def frob6(x, c1_table, c2_table):
        return jnp.stack(
            [
                conj2(x[0]),
                f2_mul(conj2(x[1]), _enc_fq2_const(c1_table, nb)),
                f2_mul(conj2(x[2]), _enc_fq2_const(c2_table, nb)),
            ]
        )

    c0 = frob6(a[0], FROB_FQ6_C1[power % 6], FROB_FQ6_C2[power % 6])
    c1 = frob6(a[1], FROB_FQ6_C1[power % 6], FROB_FQ6_C2[power % 6])
    coeff = _enc_fq2_const(FROB_FQ12_C1[power % 12], nb)
    c1 = jnp.stack([f2_mul(c1[i], coeff) for i in range(3)])
    return jnp.stack([c0, c1])


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def encode_fq12(x: Fq12):
    """pyref Fq12 -> device (2,3,2,16) array."""
    vals = [v.v for v in x.to_fq_list()]
    arr = np.asarray(S.encode(vals).T).reshape(N_LIMBS, 2, 3, 2)
    return jnp.asarray(np.moveaxis(arr, 0, -1))  # (2,3,2,16)


def decode_fq12(a) -> Fq12:
    arr = np.moveaxis(np.asarray(a), -1, 0).reshape(N_LIMBS, 12).T  # (12,16)
    vals = S.decode(arr)
    return Fq12.from_fq_list([Fq(v) for v in vals])


# ---------------------------------------------------------------------------
# Miller loop + final exponentiation
# ---------------------------------------------------------------------------


def _fold_structure():
    """(per-fold square-before flags) for the NAF walk + 2 final folds."""
    flags = []
    n = len(SIX_U_PLUS_2_NAF)
    for i in range(n - 1, 0, -1):
        flags.append(i != n - 1)  # square before the doubling-step fold
        if SIX_U_PLUS_2_NAF[i - 1] in (1, -1):
            flags.append(False)
        # (the reference squares once per NAF index, before all folds)
    flags += [False, False]
    return np.asarray(flags, dtype=bool)


_FOLD_FLAGS = _fold_structure()


def _encode_prepared(pairs):
    """[(pyref G1 affine, G2Prepared)] -> stacked scaled coeff arrays.

    Returns (c0s, c1s, c2s): each (n_folds, n_pairs, 2, 16) with c0 scaled by
    p.y and c1 by p.x (the untwist scaling, done host-side).
    """
    c0s, c1s, c2s = [], [], []
    for p, q in pairs:
        assert not p.is_infinity and not q.is_infinity
        a0, a1, a2 = [], [], []
        for (c0, c1, c2) in q.coeffs:
            sc0 = Fq2(c0.c0 * p.y, c0.c1 * p.y)
            sc1 = Fq2(c1.c0 * p.x, c1.c1 * p.x)
            a0.append(sc0)
            a1.append(sc1)
            a2.append(c2)
        c0s.append(a0)
        c1s.append(a1)
        c2s.append(a2)

    def enc(table):
        # table: [pair][fold] Fq2 -> (n_folds, n_pairs, 2, 16)
        n_pairs, n_folds = len(table), len(table[0])
        vals = []
        for f in range(n_folds):
            for pr in range(n_pairs):
                v = table[pr][f]
                vals.extend([v.c0.v, v.c1.v])
        arr = np.asarray(S.encode(vals).T).reshape(N_LIMBS, n_folds, n_pairs, 2)
        return jnp.asarray(np.moveaxis(arr, 0, -1))

    return enc(c0s), enc(c1s), enc(c2s)


@partial(jax.jit, static_argnames="n_pairs")
def _miller_scan(flags, c0s, c1s, c2s, n_pairs: int):
    def body(acc, xs):
        flag, c0, c1, c2 = xs
        acc = jax.lax.cond(flag, f12_sq, lambda x: x, acc)
        for j in range(n_pairs):
            acc = f12_mul_by_034(acc, c0[j], c1[j], c2[j])
        return acc, None

    acc, _ = jax.lax.scan(body, f12_one(), (flags, c0s, c1s, c2s))
    return acc


def multi_miller_loop_device(pairs):
    """Device Miller loop; pairs as in pyref multi_miller_loop (identity pairs
    are skipped). Returns a device Fq12."""
    live = [(p, q) for p, q in pairs if not p.is_infinity and not q.is_infinity]
    if not live:
        return f12_one()
    c0s, c1s, c2s = _encode_prepared(live)
    return _miller_scan(jnp.asarray(_FOLD_FLAGS), c0s, c1s, c2s, len(live))


_HARD_BITS = np.asarray(
    [(HARD_PART_EXP >> i) & 1 for i in range(HARD_PART_EXP.bit_length())],
    dtype=np.uint32,
)


@jax.jit
def final_exp_device(f):
    """Easy part + generic cyclotomic hard part (scan over exponent bits)."""
    t = f12_mul(f12_conj(f), f12_inv(f))
    t = f12_mul(f12_frobenius(t, 2), t)

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit != 0, f12_mul(result, base), result)
        base = f12_sq(base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (f12_one(), t), jnp.asarray(_HARD_BITS))
    return result


def pairing_device(p, q):
    """Full pairing on device from pyref affine inputs."""
    prep = G2Prepared.from_affine(q)
    mm = multi_miller_loop_device([(p, prep)])
    return final_exp_device(mm)


# jitted tower entry points (single cacheable executables)
f12_mul_jit = jax.jit(f12_mul)
f12_sq_jit = jax.jit(f12_sq)
f12_inv_jit = jax.jit(f12_inv)

"""Native (C++) host-side field runtime with ctypes bindings.

The TPU owns the batched heavy math (fields/mont.py, ops/); this module owns
the *host-side* hot paths that are sparse/sequential and don't belong on the
accelerator — constraint-system evaluation (SpMV), relaxed-R1CS residual
checks, MiMC transcript hashing — as a 4xu64 __int128-carry Montgomery
engine (the analogue of the reference's inline-asm limb module,
zkstd/src/arithmetic/limbs/bits_256/assembly.rs).

Compiled on demand with g++ (cached as _build/libkgnative-<hash>.so);
`available()` is False and callers fall back to pure Python when no
toolchain is present. All entry points take/return STANDARD-form ints.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "field256.cpp")


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    build_dir = os.path.join(_DIR, "_build")
    so = os.path.join(build_dir, f"libkgnative-{tag}.so")
    if os.path.exists(so):
        return so
    os.makedirs(build_dir, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        return None


@lru_cache(maxsize=1)
def _lib():
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        # stale/ABI-incompatible cached .so: drop it and rebuild locally once
        try:
            os.remove(so)
        except OSError:
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.kg_vec_op.argtypes = [u64p, ctypes.c_int, u64p, u64p, u64p, ctypes.c_int64]
    lib.kg_vec_scale.argtypes = [u64p, u64p, u64p, u64p, ctypes.c_int64]
    lib.kg_spmv.argtypes = [u64p, ctypes.c_int64, i64p, i64p, u64p, u64p, ctypes.c_int64, u64p]
    lib.kg_r1cs_residual.argtypes = [u64p, u64p, u64p, u64p, u64p, u64p, u64p, ctypes.c_int64]
    lib.kg_mimc_hash.argtypes = [u64p, u64p, ctypes.c_int, u64p, u64p, u64p]
    lib.kg_mimc_sponge.argtypes = [u64p, u64p, ctypes.c_int, u64p, ctypes.c_int64, u64p]
    return lib


def available() -> bool:
    return _lib() is not None


# -- conversions: python ints <-> [n][4] u64 little-endian -------------------


def ints_to_u64(vals) -> np.ndarray:
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u8").reshape(-1, 4).copy()


def u64_to_ints(arr: np.ndarray) -> list[int]:
    b = arr.astype("<u8").tobytes()
    return [int.from_bytes(b[32 * i : 32 * (i + 1)], "little") for i in range(len(arr))]


@lru_cache(maxsize=8)
def _ctx(p: int) -> np.ndarray:
    """Ctx struct: p[4], r2[4], inv — little-endian u64s."""
    r2 = (1 << 512) % p
    inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    return np.concatenate([ints_to_u64([p, r2]).reshape(8), np.array([inv], "<u8")])


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _vec_op(op: int, a, b, p: int) -> list[int]:
    lib = _lib()
    aa, bb = ints_to_u64(a), ints_to_u64(b)
    out = np.empty_like(aa)
    lib.kg_vec_op(_ptr(_ctx(p)), op, _ptr(aa), _ptr(bb), _ptr(out), len(aa))
    return u64_to_ints(out)


def vec_add(a, b, p):
    return _vec_op(0, a, b, p)


def vec_sub(a, b, p):
    return _vec_op(1, a, b, p)


def vec_mul(a, b, p):
    return _vec_op(2, a, b, p)


def vec_scale(a, k: int, p: int) -> list[int]:
    lib = _lib()
    aa = ints_to_u64(a)
    kk = ints_to_u64([k % p])
    out = np.empty_like(aa)
    lib.kg_vec_scale(_ptr(_ctx(p)), _ptr(aa), _ptr(kk), _ptr(out), len(aa))
    return u64_to_ints(out)


def spmv(indptr, indices, data, z, p: int) -> list[int]:
    """CSR sparse matrix-vector product mod p (standard-form ints)."""
    lib = _lib()
    ip = np.ascontiguousarray(indptr, dtype="<i8")
    ix = np.ascontiguousarray(indices, dtype="<i8")
    dd = ints_to_u64(data) if len(data) else np.zeros((0, 4), "<u8")
    zz = ints_to_u64(z)
    n_rows = len(ip) - 1
    out = np.empty((n_rows, 4), "<u8")
    lib.kg_spmv(
        _ptr(_ctx(p)), n_rows, _iptr(ip), _iptr(ix), _ptr(dd), _ptr(zz), len(zz), _ptr(out)
    )
    return u64_to_ints(out)


def r1cs_residual(az, bz, cz, u: int, e, p: int) -> list[int]:
    """az*bz - u*cz - e per lane (the relaxed-R1CS satisfaction residual)."""
    lib = _lib()
    a, b, c = ints_to_u64(az), ints_to_u64(bz), ints_to_u64(cz)
    ee = ints_to_u64(e)
    uu = ints_to_u64([u % p])
    out = np.empty_like(a)
    lib.kg_r1cs_residual(
        _ptr(_ctx(p)), _ptr(a), _ptr(b), _ptr(c), _ptr(uu), _ptr(ee), _ptr(out), len(a)
    )
    return u64_to_ints(out)


def mimc_hash(xl: int, xr: int, constants, p: int) -> int:
    lib = _lib()
    cts = ints_to_u64(constants)
    a, b = ints_to_u64([xl]), ints_to_u64([xr])
    out = np.empty((1, 4), "<u8")
    lib.kg_mimc_hash(_ptr(_ctx(p)), _ptr(cts), len(constants), _ptr(a), _ptr(b), _ptr(out))
    return u64_to_ints(out)[0]


def mimc_sponge(state, constants, p: int) -> int:
    """The MimcRO squeeze fold: acc=0; for s: acc += s + mimc(s, acc)."""
    lib = _lib()
    cts = ints_to_u64(constants)
    ss = ints_to_u64(state) if len(state) else np.zeros((0, 4), "<u8")
    out = np.empty((1, 4), "<u8")
    lib.kg_mimc_sponge(
        _ptr(_ctx(p)), _ptr(cts), len(constants), _ptr(ss), len(ss), _ptr(out)
    )
    return u64_to_ints(out)[0]


class CSR:
    """A constant sparse matrix over F_p, converted to native form ONCE.

    Per-call work is only the z conversion — this is what makes native SpMV
    worthwhile (one-shot conversion of the matrix data would otherwise eat
    the win). Used by nova's R1csShape for NIFS cross terms and sat checks.
    """

    def __init__(self, indptr, indices, data, p: int):
        self.p = p
        self.indptr = np.ascontiguousarray(indptr, dtype="<i8")
        self.indices = np.ascontiguousarray(indices, dtype="<i8")
        self.data = ints_to_u64(data) if len(data) else np.zeros((0, 4), "<u8")
        self.n_rows = len(self.indptr) - 1

    def mv(self, z) -> list[int]:
        lib = _lib()
        zz = ints_to_u64(z)
        out = np.empty((self.n_rows, 4), "<u8")
        lib.kg_spmv(
            _ptr(_ctx(self.p)), self.n_rows, _iptr(self.indptr), _iptr(self.indices),
            _ptr(self.data), _ptr(zz), len(zz), _ptr(out),
        )
        return u64_to_ints(out)

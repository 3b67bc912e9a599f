// 256-bit Montgomery field runtime (host-side native layer).
//
// This is the TPU build's analogue of the reference's hand-optimized native
// limb module (zkstd/src/arithmetic/limbs/bits_256/assembly.rs): 4x u64
// little-endian limbs, CIOS Montgomery multiplication with unsigned __int128
// carry chains, vectorized entry points for the host-side hot paths that do
// NOT belong on the TPU (sparse constraint evaluation, MiMC transcript
// hashing, witness vector arithmetic). Values cross the C ABI in STANDARD
// form; Montgomery is internal.
//
// ABI: every function takes a ctx = 9 little-endian u64s: p[4], r2[4], inv
// (inv = -p^-1 mod 2^64). Arrays are row-major [n][4] u64.

#include <cstdint>
#include <cstring>
#include <cstddef>

typedef uint64_t u64;
typedef unsigned __int128 u128;

struct Ctx {
    u64 p[4];
    u64 r2[4];
    u64 inv;
};

static inline void load(const u64 *src, u64 out[4]) { std::memcpy(out, src, 32); }
static inline void store(u64 *dst, const u64 in[4]) { std::memcpy(dst, in, 32); }

// a + b, returning carry-out
static inline u64 add_raw(const u64 a[4], const u64 b[4], u64 out[4]) {
    u128 acc = 0;
    for (int i = 0; i < 4; i++) {
        acc += (u128)a[i] + b[i];
        out[i] = (u64)acc;
        acc >>= 64;
    }
    return (u64)acc;
}

// a - b, returning borrow-out (1 if a < b)
static inline u64 sub_raw(const u64 a[4], const u64 b[4], u64 out[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        out[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    return (u64)borrow;
}

static inline bool gte(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return true;
        if (a[i] < b[i]) return false;
    }
    return true;
}

static inline void cond_sub_p(const Ctx *c, u64 a[4], u64 carry) {
    if (carry || gte(a, c->p)) {
        u64 t[4];
        sub_raw(a, c->p, t);
        store(a, t);
    }
}

static inline void f_add(const Ctx *c, const u64 a[4], const u64 b[4], u64 out[4]) {
    u64 carry = add_raw(a, b, out);
    cond_sub_p(c, out, carry);
}

static inline void f_sub(const Ctx *c, const u64 a[4], const u64 b[4], u64 out[4]) {
    u64 borrow = sub_raw(a, b, out);
    if (borrow) {
        u64 t[4];
        add_raw(out, c->p, t);
        store(out, t);
    }
}

// CIOS Montgomery product: out = a * b * R^-1 mod p  (R = 2^256)
static inline void mont_mul(const Ctx *c, const u64 a[4], const u64 b[4], u64 out[4]) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        // t += a[i] * b
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 v = (u128)a[i] * b[j] + t[j] + (u64)carry;
            t[j] = (u64)v;
            carry = v >> 64;
        }
        u128 v = (u128)t[4] + (u64)carry;
        t[4] = (u64)v;
        t[5] = (u64)(v >> 64);
        // m = t[0] * inv; t += m * p; t >>= 64
        u64 m = t[0] * c->inv;
        carry = ((u128)m * c->p[0] + t[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 w = (u128)m * c->p[j] + t[j] + (u64)carry;
            t[j - 1] = (u64)w;
            carry = w >> 64;
        }
        v = (u128)t[4] + (u64)carry;
        t[3] = (u64)v;
        t[4] = t[5] + (u64)(v >> 64);
        t[5] = 0;
    }
    out[0] = t[0]; out[1] = t[1]; out[2] = t[2]; out[3] = t[3];
    cond_sub_p(c, out, t[4]);
}

static inline void to_mont(const Ctx *c, const u64 a[4], u64 out[4]) {
    mont_mul(c, a, c->r2, out);
}

static inline void from_mont(const Ctx *c, const u64 a[4], u64 out[4]) {
    const u64 one[4] = {1, 0, 0, 0};
    mont_mul(c, a, one, out);
}

extern "C" {

// op: 0 = add, 1 = sub, 2 = mul (all standard form in/out)
void kg_vec_op(const u64 *ctx, int op, const u64 *a, const u64 *b, u64 *out,
               int64_t n) {
    const Ctx *c = (const Ctx *)ctx;
    u64 x[4], y[4], r[4];
    for (int64_t i = 0; i < n; i++) {
        load(a + 4 * i, x);
        load(b + 4 * i, y);
        switch (op) {
        case 0: f_add(c, x, y, r); break;
        case 1: f_sub(c, x, y, r); break;
        default:
            // standard-form product: mont_mul(to_mont(x), y) = x*y mod p
            to_mont(c, x, x);
            mont_mul(c, x, y, r);
        }
        store(out + 4 * i, r);
    }
}

// out[i] = a[i] * k  (k scalar, standard form)
void kg_vec_scale(const u64 *ctx, const u64 *a, const u64 *k, u64 *out,
                  int64_t n) {
    const Ctx *c = (const Ctx *)ctx;
    u64 km[4], x[4], r[4];
    to_mont(c, k, km);
    for (int64_t i = 0; i < n; i++) {
        load(a + 4 * i, x);
        mont_mul(c, km, x, r);
        store(out + 4 * i, r);
    }
}

// CSR SpMV: out[row] = sum_j data[j] * z[indices[j]]  (standard form)
void kg_spmv(const u64 *ctx, int64_t n_rows, const int64_t *indptr,
             const int64_t *indices, const u64 *data, const u64 *z,
             int64_t n_cols, u64 *out) {
    const Ctx *c = (const Ctx *)ctx;
    // convert z to Montgomery once: mont_mul(data_std, z_mont) = data*z std
    u64 *zm = new u64[4 * n_cols];
    u64 t[4];
    for (int64_t i = 0; i < n_cols; i++) {
        load(z + 4 * i, t);
        to_mont(c, t, t);
        store(zm + 4 * i, t);
    }
    u64 acc[4], d[4], prod[4];
    for (int64_t r = 0; r < n_rows; r++) {
        acc[0] = acc[1] = acc[2] = acc[3] = 0;
        for (int64_t j = indptr[r]; j < indptr[r + 1]; j++) {
            load(data + 4 * j, d);
            mont_mul(c, d, zm + 4 * indices[j], prod);
            f_add(c, acc, prod, acc);
        }
        store(out + 4 * r, acc);
    }
    delete[] zm;
}

// Hadamard fold: out[i] = az[i]*bz[i] - u*cz[i] - e[i]  (relaxed R1CS check)
void kg_r1cs_residual(const u64 *ctx, const u64 *az, const u64 *bz,
                      const u64 *cz, const u64 *u, const u64 *e, u64 *out,
                      int64_t n) {
    const Ctx *c = (const Ctx *)ctx;
    u64 um[4], a[4], b[4], cc[4], ee[4], ab[4], ucz[4];
    to_mont(c, u, um);
    for (int64_t i = 0; i < n; i++) {
        load(az + 4 * i, a);
        to_mont(c, a, a);
        load(bz + 4 * i, b);
        mont_mul(c, a, b, ab);           // az*bz std
        load(cz + 4 * i, cc);
        mont_mul(c, um, cc, ucz);        // u*cz std
        load(e + 4 * i, ee);
        f_sub(c, ab, ucz, ab);
        f_sub(c, ab, ee, ab);
        store(out + 4 * i, ab);
    }
}

// MiMC-x^7 Feistel hash: returns left lane after `rounds` rounds.
// cts: [rounds][4] standard form. xl/xr: [4]. out: [4].
static inline void mimc_rounds(const Ctx *c, const u64 *cts_m, int rounds,
                               u64 xl[4], u64 xr[4]) {
    u64 cxl[4], c2[4], c4[4], c7[4], nl[4];
    for (int i = 0; i < rounds; i++) {
        f_add(c, xl, cts_m + 4 * i, cxl);
        mont_mul(c, cxl, cxl, c2);
        mont_mul(c, c2, c2, c4);
        mont_mul(c, c2, c4, c7);
        mont_mul(c, c7, cxl, c7);        // (xl+c)^7
        f_add(c, c7, xr, nl);
        store(xr, xl);
        store(xl, nl);
    }
}

void kg_mimc_hash(const u64 *ctx, const u64 *cts, int rounds, const u64 *xl_in,
                  const u64 *xr_in, u64 *out) {
    const Ctx *c = (const Ctx *)ctx;
    u64 *cm = new u64[4 * rounds];
    u64 t[4];
    for (int i = 0; i < rounds; i++) {
        load(cts + 4 * i, t);
        to_mont(c, t, t);
        store(cm + 4 * i, t);
    }
    u64 xl[4], xr[4];
    load(xl_in, xl); to_mont(c, xl, xl);
    load(xr_in, xr); to_mont(c, xr, xr);
    mimc_rounds(c, cm, rounds, xl, xr);
    from_mont(c, xl, t);
    store(out, t);
    delete[] cm;
}

// Sponge squeeze fold (nova/src/hash.rs:87-102): acc = 0; for each s:
// h = mimc(s, acc); acc = acc + s + h. Returns final acc (standard form).
void kg_mimc_sponge(const u64 *ctx, const u64 *cts, int rounds, const u64 *state,
                    int64_t n, u64 *out) {
    const Ctx *c = (const Ctx *)ctx;
    u64 *cm = new u64[4 * rounds];
    u64 t[4];
    for (int i = 0; i < rounds; i++) {
        load(cts + 4 * i, t);
        to_mont(c, t, t);
        store(cm + 4 * i, t);
    }
    u64 acc[4] = {0, 0, 0, 0};
    u64 s[4], xl[4], xr[4];
    for (int64_t i = 0; i < n; i++) {
        load(state + 4 * i, s);
        to_mont(c, s, s);
        store(xl, s);
        store(xr, acc);
        mimc_rounds(c, cm, rounds, xl, xr);  // h = mimc(s, acc)
        f_add(c, acc, s, acc);
        f_add(c, acc, xl, acc);
    }
    from_mont(c, acc, t);
    store(out, t);
    delete[] cm;
}

}  // extern "C"

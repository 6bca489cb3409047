// hectr_host: native host-side exact arithmetic for the TPU CKKS stack.
//
// The reference's native layer is C: GPQHE's bignum polynomial type
// poly_mpi_t is built on libgcrypt MPI integers (SURVEY.md §2.3, call
// sites /root/reference/src/ctr.c:515-521).  The TPU rebuild keeps all
// *device* math in RNS uint32 (JAX/Pallas); this library is the native
// equivalent of the host-side bignum layer: exact CRT reconstruction,
// RNS conversion, and an exact negacyclic NTT oracle used by the test
// suite to validate device kernels independently (the Python
// object-integer fallback in hectr_tpu/ckks/modmath.py implements the
// same contracts ~100x slower).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC hectr_host.cpp -o libhectr_host.so
// ABI: plain C functions over caller-allocated buffers (ctypes-friendly).

#include <cstdint>
#include <cstring>
#include <vector>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

// ---------------------------------------------------------------------
// minimal little-endian multiword unsigned arithmetic (fixed width W)
// ---------------------------------------------------------------------

struct Big {
    std::vector<u64> w;  // little-endian words
    explicit Big(size_t nwords) : w(nwords, 0) {}
};

// a += b (same width); returns carry out
inline u64 add_inplace(u64* a, const u64* b, size_t n) {
    u128 carry = 0;
    for (size_t i = 0; i < n; i++) {
        u128 s = (u128)a[i] + b[i] + carry;
        a[i] = (u64)s;
        carry = s >> 64;
    }
    return (u64)carry;
}

// a -= b (requires a >= b)
inline void sub_inplace(u64* a, const u64* b, size_t n) {
    u128 borrow = 0;
    for (size_t i = 0; i < n; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

inline int cmp(const u64* a, const u64* b, size_t n) {
    for (size_t i = n; i-- > 0;) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

// out = a * m (small m), out width n; returns the carry word (must be
// 0 if the product fits)
inline u64 mul_small(const u64* a, u64 m, u64* out, size_t n) {
    u128 carry = 0;
    for (size_t i = 0; i < n; i++) {
        u128 p = (u128)a[i] * m + carry;
        out[i] = (u64)p;
        carry = p >> 64;
    }
    return (u64)carry;
}

// a mod m for small m: fold words high->low
inline u64 mod_small(const u64* a, size_t n, u64 m) {
    u128 r = 0;
    for (size_t i = n; i-- > 0;) {
        r = ((r << 64) | a[i]) % m;
    }
    return (u64)r;
}

inline u64 mulmod(u64 a, u64 b, u64 p) { return (u64)((u128)a * b % p); }

inline u64 powmod(u64 b, u64 e, u64 p) {
    u64 r = 1;
    b %= p;
    while (e) {
        if (e & 1) r = mulmod(r, b, p);
        b = mulmod(b, b, p);
        e >>= 1;
    }
    return r;
}

}  // namespace

extern "C" {

// Exact CRT: residues[L*N] (limb-major), primes[L] -> centered signed
// values as (neg[N], mag[N*out_words]) with mag little-endian u64.
// out_words must satisfy 64*out_words >= bits(prod primes) + 1.
// Returns 0 on success, -1 if out_words is too small.
int hectr_crt_centered(const u32* residues, const u64* primes,
                       int64_t L, int64_t N, int64_t out_words,
                       uint8_t* neg, u64* mag) {
    const size_t W = (size_t)out_words;
    // Q and Q_i = Q / p_i ; caller must size W so that 2Q < 2^(64W)
    // (the accumulator below reaches values < 2Q before reduction)
    Big Q(W);
    Q.w[0] = 1;
    std::vector<u64> tmp(W, 0);
    for (int64_t i = 0; i < L; i++) {
        if (mul_small(Q.w.data(), primes[i], tmp.data(), W) != 0) return -1;
        std::memcpy(Q.w.data(), tmp.data(), W * 8);
    }
    if (Q.w[W - 1] >> 63) return -1;  // need headroom for acc < 2Q
    std::vector<Big> Qi;
    std::vector<u64> inv(L);
    Qi.reserve(L);
    for (int64_t i = 0; i < L; i++) {
        Big qi(W);
        qi.w[0] = 1;
        for (int64_t j = 0; j < L; j++) {
            if (j == i) continue;
            if (mul_small(qi.w.data(), primes[j], tmp.data(), W) != 0)
                return -1;
            std::memcpy(qi.w.data(), tmp.data(), W * 8);
        }
        u64 qi_mod = mod_small(qi.w.data(), W, primes[i]);
        inv[i] = powmod(qi_mod, primes[i] - 2, primes[i]);  // p prime
        Qi.push_back(std::move(qi));
    }
    // Q/2 for centering (right shift: bit 0 of word i+1 tops word i)
    Big half(W);
    for (size_t i = 0; i < W; i++) {
        u64 hi = (i + 1 < W) ? (Q.w[i + 1] & 1) : 0;
        half.w[i] = (Q.w[i] >> 1) | (hi << 63);
    }

    std::vector<u64> acc(W), term(W);
    for (int64_t k = 0; k < N; k++) {
        std::fill(acc.begin(), acc.end(), 0);
        for (int64_t i = 0; i < L; i++) {
            u64 c = mulmod(residues[i * N + k] % primes[i], inv[i], primes[i]);
            if (mul_small(Qi[i].w.data(), c, term.data(), W) != 0) return -1;
            add_inplace(acc.data(), term.data(), W);
            if (cmp(acc.data(), Q.w.data(), W) >= 0)
                sub_inplace(acc.data(), Q.w.data(), W);
        }
        // center: if acc > Q/2 -> negative, magnitude Q - acc
        if (cmp(acc.data(), half.w.data(), W) > 0) {
            neg[k] = 1;
            Big m(W);
            std::memcpy(m.w.data(), Q.w.data(), W * 8);
            sub_inplace(m.w.data(), acc.data(), W);
            std::memcpy(mag + k * W, m.w.data(), W * 8);
        } else {
            neg[k] = 0;
            std::memcpy(mag + k * W, acc.data(), W * 8);
        }
    }
    return 0;
}

// Signed multiword values -> RNS residues.  (neg[N], mag[N*in_words])
// -> residues[L*N] (limb-major).
int hectr_to_rns(const uint8_t* neg, const u64* mag, const u64* primes,
                 int64_t L, int64_t N, int64_t in_words, u32* residues) {
    for (int64_t i = 0; i < L; i++) {
        const u64 p = primes[i];
        for (int64_t k = 0; k < N; k++) {
            u64 r = mod_small(mag + k * in_words, (size_t)in_words, p);
            if (neg[k] && r != 0) r = p - r;
            residues[i * N + k] = (u32)r;
        }
    }
    return 0;
}

// Exact negacyclic forward NTT over one prime (oracle; natural ->
// bit-reversed order, merged-psi Cooley-Tukey, matching
// hectr_tpu/ckks/ntt.py).  a[n] in place.  psi = 2n-th root of unity.
int hectr_ntt_ref(u32* a, int64_t n, u64 p, u64 psi) {
    // psi powers in bit-reversed order
    int logn = 0;
    while ((1LL << logn) < n) logn++;
    if ((1LL << logn) != n) return -1;
    std::vector<u64> psi_rev((size_t)n);
    u64 acc = 1;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = 0;
        for (int b = 0; b < logn; b++) r |= ((i >> b) & 1LL) << (logn - 1 - b);
        // store psi^i at position brv(i): fill by walking i
        psi_rev[(size_t)r] = acc;
        acc = mulmod(acc, psi, p);
    }
    int64_t half = n, m = 1;
    while (m < n) {
        half >>= 1;
        for (int64_t g = 0; g < m; g++) {
            const u64 S = psi_rev[(size_t)(m + g)];
            u32* base = a + g * 2 * half;
            for (int64_t j = 0; j < half; j++) {
                u64 u = base[j];
                u64 v = mulmod(base[j + half], S, p);
                base[j] = (u32)((u + v) % p);
                base[j + half] = (u32)((u + p - v) % p);
            }
        }
        m <<= 1;
    }
    return 0;
}

// Exact negacyclic inverse NTT (bit-reversed -> natural, scaled 1/n).
int hectr_intt_ref(u32* a, int64_t n, u64 p, u64 psi) {
    int logn = 0;
    while ((1LL << logn) < n) logn++;
    if ((1LL << logn) != n) return -1;
    const u64 psi_inv = powmod(psi, p - 2, p);
    std::vector<u64> psi_inv_rev((size_t)n);
    u64 acc = 1;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = 0;
        for (int b = 0; b < logn; b++) r |= ((i >> b) & 1LL) << (logn - 1 - b);
        psi_inv_rev[(size_t)r] = acc;
        acc = mulmod(acc, psi_inv, p);
    }
    int64_t half = 1, m = n;
    while (m > 1) {
        int64_t h = m >> 1;
        for (int64_t g = 0; g < h; g++) {
            const u64 S = psi_inv_rev[(size_t)(h + g)];
            u32* base = a + g * 2 * half;
            for (int64_t j = 0; j < half; j++) {
                u64 u = base[j];
                u64 v = base[j + half];
                base[j] = (u32)((u + v) % p);
                base[j + half] = (u32)mulmod((u + p - v) % p, S, p);
            }
        }
        half <<= 1;
        m = h;
    }
    const u64 n_inv = powmod((u64)n % p, p - 2, p);
    for (int64_t i = 0; i < n; i++) a[i] = (u32)mulmod(a[i], n_inv, p);
    return 0;
}

// Exact negacyclic schoolbook product mod (X^n + 1, p): independent
// O(n^2) oracle (no shared code with the NTT path).
int hectr_negacyclic_mul_ref(const u32* x, const u32* y, int64_t n, u64 p,
                             u32* out) {
    for (int64_t k = 0; k < n; k++) {
        u128 acc_pos = 0, acc_neg = 0;
        for (int64_t i = 0; i <= k; i++)
            acc_pos += (u128)x[i] * y[k - i] % p;
        for (int64_t i = k + 1; i < n; i++)
            acc_neg += (u128)x[i] * y[n + k - i] % p;
        u64 r = (u64)((acc_pos + ((u128)p * n - acc_neg)) % p);
        out[k] = (u32)r;
    }
    return 0;
}

int hectr_host_abi_version(void) { return 1; }

}  // extern "C"

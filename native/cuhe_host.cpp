// Native host-math kernels for cuhe_tpu.
//
// The reference library delegates all host bignum work to NTL (polynomial
// inversion for keygen via ZZ_pE inv, examples/DHS/DHS.cu:377-393; coefficient
// serialization via BytesFromZZ, cuhe/CuHE.cu:317-348).  This file provides the
// TPU build's native equivalents: a batched polynomial extended-GCD modulo the
// CRT primes (OpenMP across primes) and planar u32 word (un)packing.  Exposed
// as a plain C ABI consumed through ctypes (cuhe_tpu/hostmath.py).
//
// All primes are < 2^31 and residue products fit in int64, so no wide
// arithmetic is needed in the inner elimination loops.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

int64_t mod_inverse(int64_t a, int64_t p) {
  // extended Euclid over the integers
  int64_t r0 = p, r1 = ((a % p) + p) % p;
  int64_t t0 = 0, t1 = 1;
  while (r1 != 0) {
    int64_t q = r0 / r1;
    int64_t r2 = r0 - q * r1;
    r0 = r1;
    r1 = r2;
    int64_t t2 = t0 - q * t1;
    t0 = t1;
    t1 = t2;
  }
  if (r0 != 1) return -1;  // not invertible (p should be prime)
  return ((t0 % p) + p) % p;
}

// inverse of f modulo (m(x), p); n = deg(m).  f has n coefficients (deg < n),
// m has n+1.  out receives n coefficients.  Returns 0 on success.
int inv_one(const int64_t* f, const int64_t* m, int64_t p, int n,
            int64_t* out) {
  std::vector<int64_t> r0(m, m + n + 1);
  std::vector<int64_t> r1(n + 1, 0);
  std::vector<int64_t> s0(n + 1, 0);
  std::vector<int64_t> s1(n + 1, 0);
  for (int i = 0; i <= n; i++) r0[i] = ((r0[i] % p) + p) % p;
  for (int i = 0; i < n; i++) r1[i] = ((f[i] % p) + p) % p;
  s1[0] = 1;
  int d0 = n, d1 = n;
  while (d0 >= 0 && r0[d0] == 0) d0--;
  while (d1 >= 0 && r1[d1] == 0) d1--;
  if (d0 < 0) return -1;
  while (d1 > 0) {
    int64_t inv_lc1 = mod_inverse(r1[d1], p);
    if (inv_lc1 < 0) return -1;
    while (d0 >= d1) {
      int64_t lc0 = r0[d0];
      if (lc0 != 0) {
        int64_t c = lc0 * inv_lc1 % p;  // < 2^52 before mod: p < 2^31
        int k = d0 - d1;
        int64_t* r0k = r0.data() + k;
        const int64_t* r1d = r1.data();
        for (int i = 0; i <= d1; i++) {
          int64_t v = (r0k[i] - c * r1d[i]) % p;
          r0k[i] = v < 0 ? v + p : v;
        }
        int64_t* s0k = s0.data() + k;
        const int64_t* s1d = s1.data();
        int lim = n - k;
        for (int i = 0; i <= lim; i++) {
          int64_t v = (s0k[i] - c * s1d[i]) % p;
          s0k[i] = v < 0 ? v + p : v;
        }
      }
      d0--;
    }
    r0.swap(r1);
    s0.swap(s1);
    std::swap(d0, d1);
    while (d1 >= 0 && r1[d1] == 0) d1--;
    if (d1 < 0) return -1;
  }
  if (d1 < 0 || r1[0] == 0) return -1;
  int64_t cinv = mod_inverse(r1[0], p);
  if (cinv < 0) return -1;
  for (int i = 0; i < n; i++) out[i] = s1[i] * cinv % p;
  return 0;
}

}  // namespace

extern "C" {

// fs: [np][n] residues of f mod p_i; ms: [np][n+1] residues of m(x);
// ps: [np]; out: [np][n]; ok: [np] (0 = success per prime).
void poly_inv_batch(const int64_t* fs, const int64_t* ms, const int64_t* ps,
                    int np, int n, int64_t* out, int32_t* ok) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < np; i++) {
    ok[i] = inv_one(fs + (int64_t)i * n, ms + (int64_t)i * (n + 1), ps[i], n,
                    out + (int64_t)i * n);
  }
}

// Pack little-endian byte coefficients into planar u32 word arrays.
// src: [ncoeff][nbytes] raw little-endian bytes; dst: [words][length] planar.
void pack_words_planar(const uint8_t* src, int ncoeff, int words, int length,
                       uint32_t* dst) {
  std::memset(dst, 0, sizeof(uint32_t) * (size_t)words * length);
  int nbytes = words * 4;
  for (int i = 0; i < ncoeff && i < length; i++) {
    const uint8_t* c = src + (size_t)i * nbytes;
    for (int w = 0; w < words; w++) {
      uint32_t v;
      std::memcpy(&v, c + 4 * w, 4);
      dst[(size_t)w * length + i] = v;
    }
  }
}

// Inverse of pack_words_planar.
void unpack_words_planar(const uint32_t* src, int words, int length,
                         uint8_t* dst) {
  int nbytes = words * 4;
  for (int i = 0; i < length; i++) {
    uint8_t* c = dst + (size_t)i * nbytes;
    for (int w = 0; w < words; w++) {
      uint32_t v = src[(size_t)w * length + i];
      std::memcpy(c + 4 * w, &v, 4);
    }
  }
}

int cuhe_host_version() { return 1; }

}  // extern "C"

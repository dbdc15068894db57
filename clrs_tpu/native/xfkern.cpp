// k-limb float-expansion kernels (host, C++) for the high-precision solve
// path.
//
// This is the native-runtime replacement for the reference solver's
// Arb/FLINT matrix kernel set (SURVEY.md §2.9; Arblib.approx_mul!
// MPMP.jl:1291-1311, approx_lu! :1436/:1501, approx_solve_tril!/triu!
// :1459-1463, spd_inv!/cho! :766/:1846) at the reference's own operating
// precision: k limbs of f64 give ~53k-bit significands (k=10 ~ 530 bits,
// the reference's setprecision(512), examples/SpherePacking.jl:29-31).
// The TPU/XLA expansion path (ops/xfloat.py) covers k<=8 economically;
// XLA compile cost explodes at k>=9 (unrolled kernels >114 GB compiler
// RSS at k=10), so the high-k rungs run here instead: same algorithms
// (error-free transforms, per-order cascades), no compiler in the loop.
//
// Algorithms mirror ops/xfloat.py exactly (QD / CAMPARY style):
//   two_sum (Knuth), two_prod via FMA, _cascade_add / _cascade_mul
//   per-order error cascades, VecSum renormalization pull-up.
// Tested limb-for-limb against mpmath via tests/test_hostxf.py.
//
// Two performance levers, both preserving BIT-IDENTICAL per-element
// results (the IEEE op sequence per output element never changes):
//   1. The limb count is a TEMPLATE parameter (instantiated for
//      K = 1..16, dispatched once per array call): cascade loops fully
//      unroll, per-order group buffers become fixed-size stack arrays.
//   2. The cascade primitives are ALSO templated on the element type:
//      E = double (scalar) or E = __m512d (AVX-512, 8 independent output
//      elements per vector lane).  The serial two_sum/two_prod dependency
//      chains are the bottleneck and cannot be shortened, but they are
//      elementwise-independent across output elements, so gemm / trsm /
//      Cholesky-update / LU-update run 8 lanes wide (vaddpd/vmulpd/
//      vfmadd231pd are exact IEEE per lane -> lanes match the scalar
//      path bit-for-bit).
//
// Array layout: limb-major C-contiguous, shape (k, n) for n elements --
// limb l of element i at a[l*n + i] -- matching XF.limbs / numpy.
//
// Build: g++ -O3 -march=native -ffp-contract=off -fopenmp -shared -fPIC
// (-ffp-contract=off: EFTs need exact IEEE ops; FMA is used EXPLICITLY
// via std::fma / _mm512_fmadd_pd where wanted, never by contraction.)

#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(__AVX512F__)
#include <immintrin.h>
#define XK_HAVE_AVX512 1
#endif

namespace {

constexpr int KMAX = 16;

// ---- element-type abstraction: double (scalar) or __m512d (8 lanes) ----

template <class E>
static inline E vbcast(double x);
template <>
inline double vbcast<double>(double x) {
  return x;
}
static inline double vfma_(double a, double b, double c) {
  return std::fma(a, b, c);
}
#ifdef XK_HAVE_AVX512
template <>
inline __m512d vbcast<__m512d>(double x) {
  return _mm512_set1_pd(x);
}
static inline __m512d vfma_(__m512d a, __m512d b, __m512d c) {
  return _mm512_fmadd_pd(a, b, c);
}
#endif

template <class E>
static inline void two_sum(E a, E b, E &s, E &e) {
  s = a + b;
  E bb = s - a;
  e = (a - (s - bb)) + (b - bb);
}

// exact product via hardware FMA: p = fl(a*b), e = fma(a,b,-p)
template <class E>
static inline void two_prod(E a, E b, E &p, E &e) {
  p = a * b;
  e = vfma_(a, b, -p);
}

// VecSum (Ogita-Rump-Oishi): exact transform, leading approx first.
template <int N, class E>
static inline void vec_sum(E *t) {
  E s = t[N - 1];
  for (int i = N - 2; i >= 0; --i) {
    E e;
    two_sum(t[i], s, s, e);
    t[i + 1] = e;
  }
  t[0] = s;
}

// k-limb add: per-order error cascades (ops/xfloat.py _cascade_add).
// out may alias a or b.
template <int K, class E = double>
static inline void sc_add(const E *a, const E *b, E *out) {
  if (K == 1) {
    out[0] = a[0] + b[0];
    return;
  }
  E s[K > 1 ? K : 2], e[K > 1 ? K : 2];
  E carry[2 * K + 2], vals[K + 1];
  for (int i = 0; i < K - 1; ++i) two_sum(a[i], b[i], s[i], e[i]);
  vals[0] = s[0];
  int nc = 1;
  carry[0] = e[0];
  for (int i = 1; i < K - 1; ++i) {
    E v = s[i];
    E nxt[2 * K + 2];
    int nn = 0;
    for (int c = 0; c < nc; ++c) {
      E g;
      two_sum(v, carry[c], v, g);
      nxt[nn++] = g;
    }
    vals[i] = v;
    nxt[nn++] = e[i];
    nc = nn;
    for (int c = 0; c < nc; ++c) carry[c] = nxt[c];
  }
  E top = a[K - 1] + b[K - 1];
  for (int c = 0; c < nc; ++c) top = top + carry[c];
  vals[K - 1] = top;
  // renormalization chain + VecSum pull-up (canonical leading limbs)
  E r[K + 1];
  E hi, err;
  two_sum(vals[0], vals[1], hi, err);
  r[0] = hi;
  for (int i = 2; i < K; ++i) {
    two_sum(err, vals[i], hi, err);
    r[i - 1] = hi;
  }
  r[K - 1] = err;
  vec_sum<K, E>(r);
  for (int i = 0; i < K; ++i) out[i] = r[i];
}

// k-limb multiply: per-order cascades (ops/xfloat.py _cascade_mul).
// groups[o] term-count recurrence gn[o] = gn[o-1] + 2o => 1 + o(o+1).
template <int K, class E = double>
static inline void sc_mul(const E *a, const E *b, E *out) {
  if (K == 1) {
    out[0] = a[0] * b[0];
    return;
  }
  constexpr int CAP = K * (K + 1) + 4;
  E groups[K][CAP];
  int gn[K];
  for (int o = 0; o < K; ++o) gn[o] = 0;
  for (int o = 0; o < K - 1; ++o) {
    for (int i = 0; i <= o; ++i) {
      int j = o - i;
      if (i < K && j < K) {
        E p, e;
        two_prod(a[i], b[j], p, e);
        groups[o][gn[o]++] = p;
        if (o + 1 < K) groups[o + 1][gn[o + 1]++] = e;
      }
    }
  }
  E cheap = vbcast<E>(0.0);
  for (int o = K - 1; o <= K; ++o) {
    for (int i = 0; i <= o; ++i) {
      int j = o - i;
      if (i < K && j < K) cheap = cheap + a[i] * b[j];
    }
  }
  groups[K - 1][gn[K - 1]++] = cheap;
  E vals[K];
  for (int o = 0; o < K; ++o) {
    if (gn[o] == 0) {
      vals[o] = vbcast<E>(0.0);
      continue;
    }
    E v = groups[o][0];
    for (int t = 1; t < gn[o]; ++t) {
      if (o == K - 1) {
        v = v + groups[o][t];  // below last-limb ulp
      } else {
        E g;
        two_sum(v, groups[o][t], v, g);
        groups[o + 1][gn[o + 1]++] = g;
      }
    }
    vals[o] = v;
  }
  E r[K + 1];
  E hi, err;
  two_sum(vals[0], vals[1], hi, err);
  r[0] = hi;
  for (int i = 2; i < K; ++i) {
    two_sum(err, vals[i], hi, err);
    r[i - 1] = hi;
  }
  r[K - 1] = err;
  vec_sum<K, E>(r);
  for (int i = 0; i < K; ++i) out[i] = r[i];
}

template <int K, class E = double>
static inline void sc_neg(const E *a, E *out) {
  for (int i = 0; i < K; ++i) out[i] = -a[i];
}

template <int K, class E = double>
static inline void sc_sub(const E *a, const E *b, E *out) {
  E nb[K];
  sc_neg<K, E>(b, nb);
  sc_add<K, E>(a, nb, out);
}

template <int K, class E = double>
static inline void sc_set_d(double v, E *out) {
  out[0] = vbcast<E>(v);
  for (int i = 1; i < K; ++i) out[i] = vbcast<E>(0.0);
}

constexpr int newton_iters(int k) {
  int it = 1;
  while ((1 << it) < k) ++it;
  return it + 1;
}

// Newton reciprocal (ops/xfloat.py xf_reciprocal) -- scalar only (seeds
// from a hardware divide); vector paths broadcast a scalar reciprocal.
template <int K>
static inline void sc_recip(const double *b, double *out) {
  double x[K], e[K], t[K], one[K];
  sc_set_d<K>(1.0 / b[0], x);
  sc_set_d<K>(1.0, one);
  constexpr int iters = newton_iters(K);
  for (int it = 0; it < iters; ++it) {
    sc_mul<K>(b, x, t);
    sc_sub<K>(one, t, e);  // e = 1 - b*x
    sc_mul<K>(x, e, t);
    sc_add<K>(x, t, x);    // x += x*e
  }
  for (int i = 0; i < K; ++i) out[i] = x[i];
}

// one refinement step given a precomputed reciprocal r ~ 1/b:
// q = a*r; q += (a - b*q)*r.  This IS sc_div's sequence after its
// sc_recip call, shared so the scalar and vector paths stay bit-equal.
// NOTE: at K == 1 this Newton-refined quotient differs (by an ulp) from
// sc_div's K==1 hardware-divide early-out, so the trsm bodies — which
// always route divides through here to amortize the per-pivot reciprocal
// — diverge from t_div at K=1.  Harmless: the solver's host path uses
// K >= 2 everywhere, and scalar/vector trsm paths agree at every K.
template <int K, class E = double>
static inline void sc_div_with_recip(const E *a, const E *b, const E *r,
                                     E *out) {
  E q[K], t[K], res[K];
  sc_mul<K, E>(a, r, q);
  sc_mul<K, E>(b, q, t);
  sc_sub<K, E>(a, t, res);
  sc_mul<K, E>(res, r, t);
  sc_add<K, E>(q, t, out);
}

template <int K>
static inline void sc_div(const double *a, const double *b, double *out) {
  if (K == 1) {
    out[0] = a[0] / b[0];
    return;
  }
  double r[K];
  sc_recip<K>(b, r);
  sc_div_with_recip<K>(a, b, r, out);
}

// sqrt via Newton on rsqrt (ops/xfloat.py xf_sqrt); a >= 0 (0 allowed).
template <int K>
static inline void sc_sqrt(const double *a, double *out) {
  if (a[0] <= 0.0) {
    sc_set_d<K>(a[0] == 0.0 ? 0.0 : std::nan(""), out);
    return;
  }
  if (K == 1) {
    out[0] = std::sqrt(a[0]);
    return;
  }
  double x[K], e[K], t[K], u[K], one[K], half[K], s[K];
  sc_set_d<K>(1.0 / std::sqrt(a[0]), x);
  sc_set_d<K>(1.0, one);
  sc_set_d<K>(0.5, half);
  constexpr int iters = newton_iters(K);
  for (int it = 0; it < iters; ++it) {
    sc_mul<K>(x, x, t);
    sc_mul<K>(a, t, u);
    sc_sub<K>(one, u, e);     // e = 1 - a*x*x
    sc_mul<K>(x, e, t);
    sc_mul<K>(half, t, u);
    sc_add<K>(x, u, x);       // x += 0.5*x*e
  }
  sc_mul<K>(a, x, s);         // s = a * rsqrt(a)
  sc_mul<K>(s, s, t);
  sc_sub<K>(a, t, e);
  sc_mul<K>(e, x, t);
  sc_mul<K>(half, t, u);
  sc_add<K>(s, u, out);
}

// ---- strided element access ----
// Arrays are (k, n) limb-major: limb l of element i at base[l*n + i].

template <int K>
static inline void gather(const double *base, int64_t n, int64_t i,
                          double *buf) {
  for (int l = 0; l < K; ++l) buf[l] = base[(int64_t)l * n + i];
}

template <int K>
static inline void scatter(double *base, int64_t n, int64_t i,
                           const double *buf) {
  for (int l = 0; l < K; ++l) base[(int64_t)l * n + i] = buf[l];
}

#ifdef XK_HAVE_AVX512
// broadcast a scalar K-limb value into K vector registers
template <int K>
static inline void vbcast_limbs(const double *buf, __m512d *out) {
  for (int l = 0; l < K; ++l) out[l] = _mm512_set1_pd(buf[l]);
}

// contiguous 8-element load/store per limb slab (slab stride sz)
template <int K>
static inline void vload(const double *base, int64_t sz, int64_t i,
                         __m512d *out) {
  for (int l = 0; l < K; ++l)
    out[l] = _mm512_loadu_pd(base + (int64_t)l * sz + i);
}

template <int K>
static inline void vstore(double *base, int64_t sz, int64_t i,
                          const __m512d *v) {
  for (int l = 0; l < K; ++l)
    _mm512_storeu_pd(base + (int64_t)l * sz + i, v[l]);
}

// strided 8-element gather/scatter per limb slab (element indices idx)
template <int K>
static inline void vgather(const double *base, int64_t sz, __m512i idx,
                           __m512d *out) {
  for (int l = 0; l < K; ++l)
    out[l] = _mm512_i64gather_pd(idx, base + (int64_t)l * sz, 8);
}

template <int K>
static inline void vscatter(double *base, int64_t sz, __m512i idx,
                            const __m512d *v) {
  for (int l = 0; l < K; ++l)
    _mm512_i64scatter_pd(base + (int64_t)l * sz, idx, v[l], 8);
}

static inline __m512i viota(int64_t start, int64_t stride) {
  alignas(64) int64_t ji[8];
  for (int l = 0; l < 8; ++l) ji[l] = start + (int64_t)l * stride;
  return _mm512_load_si512((const void *)ji);
}
#endif

// ---- templated array kernels ----

// elementwise binary kernels: contiguous elements -> 8 AVX-512 lanes,
// scalar tail; per-element op sequence identical either way.
#ifdef XK_HAVE_AVX512
#define XK_ELEMWISE2(SCOP)                                          \
  const int64_t nv = n & ~(int64_t)7;                               \
  _Pragma("omp parallel for schedule(static) if (nv >= 512)")      \
  for (int64_t i0 = 0; i0 < nv; i0 += 8) {                          \
    __m512d xv[K], yv[K], zv[K];                                    \
    vload<K>(a, n, i0, xv);                                         \
    vload<K>(b, n, i0, yv);                                         \
    SCOP<K, __m512d>(xv, yv, zv);                                   \
    vstore<K>(out, n, i0, zv);                                      \
  }                                                                 \
  for (int64_t i = nv; i < n; ++i) {                                \
    double x[K], y[K], z[K];                                        \
    gather<K>(a, n, i, x);                                          \
    gather<K>(b, n, i, y);                                          \
    SCOP<K>(x, y, z);                                               \
    scatter<K>(out, n, i, z);                                       \
  }
#else
#define XK_ELEMWISE2(SCOP)                                          \
  _Pragma("omp parallel for schedule(static) if (n >= 256)")        \
  for (int64_t i = 0; i < n; ++i) {                                 \
    double x[K], y[K], z[K];                                        \
    gather<K>(a, n, i, x);                                          \
    gather<K>(b, n, i, y);                                          \
    SCOP<K>(x, y, z);                                               \
    scatter<K>(out, n, i, z);                                       \
  }
#endif

template <int K>
static void t_add(int64_t n, const double *a, const double *b, double *out) {
  XK_ELEMWISE2(sc_add)
}

template <int K>
static void t_sub(int64_t n, const double *a, const double *b, double *out) {
  XK_ELEMWISE2(sc_sub)
}

template <int K>
static void t_mul(int64_t n, const double *a, const double *b, double *out) {
  XK_ELEMWISE2(sc_mul)
}

template <int K>
static void t_div(int64_t n, const double *a, const double *b, double *out) {
#pragma omp parallel for schedule(static) if (n >= 64)
  for (int64_t i = 0; i < n; ++i) {
    double x[K], y[K], z[K];
    gather<K>(a, n, i, x);
    gather<K>(b, n, i, y);
    sc_div<K>(x, y, z);
    scatter<K>(out, n, i, z);
  }
}

template <int K>
static void t_sqrt(int64_t n, const double *a, double *out) {
#pragma omp parallel for schedule(static) if (n >= 64)
  for (int64_t i = 0; i < n; ++i) {
    double x[K], z[K];
    gather<K>(a, n, i, x);
    sc_sqrt<K>(x, z);
    scatter<K>(out, n, i, z);
  }
}

template <int K>
static void t_scale(int64_t n, const double *a, const double *s,
                    double *out) {
  int64_t i = 0;
#ifdef XK_HAVE_AVX512
  {
    const int64_t nv = n & ~(int64_t)7;
    __m512d sv[K];
    vbcast_limbs<K>(s, sv);
#pragma omp parallel for schedule(static) if (nv >= 512)
    for (int64_t i0 = 0; i0 < nv; i0 += 8) {
      __m512d xv[K], zv[K];
      vload<K>(a, n, i0, xv);
      sc_mul<K, __m512d>(xv, sv, zv);
      vstore<K>(out, n, i0, zv);
    }
    i = nv;
  }
#endif
#pragma omp parallel for schedule(static) if (n - i >= 256)
  for (int64_t i2 = i; i2 < n; ++i2) {
    double x[K], z[K];
    gather<K>(a, n, i2, x);
    sc_mul<K>(x, s, z);
    scatter<K>(out, n, i2, z);
  }
}

template <int K>
static void t_sum(int64_t n, const double *a, double *out) {
  double acc[K], x[K];
  sc_set_d<K>(0.0, acc);
  for (int64_t i = 0; i < n; ++i) {
    gather<K>(a, n, i, x);
    sc_add<K>(acc, x, acc);
  }
  for (int i = 0; i < K; ++i) out[i] = acc[i];
}

template <int K>
static void t_dot(int64_t n, const double *a, const double *b, double *out) {
  double acc[K], x[K], y[K], p[K];
  sc_set_d<K>(0.0, acc);
  for (int64_t i = 0; i < n; ++i) {
    gather<K>(a, n, i, x);
    gather<K>(b, n, i, y);
    sc_mul<K>(x, y, p);
    sc_add<K>(acc, p, acc);
  }
  for (int i = 0; i < K; ++i) out[i] = acc[i];
}

// one row of C, scalar path, columns [jstart, n).  JB output columns per
// pass: the K-limb mul/add cascades are serial dependency chains, so
// interleaving JB independent columns fills the superscalar pipeline
// (x gathered once per (i,t)).
template <int K>
static inline void gemm_row_scalar(int64_t i, int64_t jstart, int64_t m,
                                   int64_t p, int64_t n, const double *A,
                                   const double *B, double *C, int ta,
                                   int tb) {
  const int64_t asz = m * p, bsz = p * n, csz = m * n;
  constexpr int JB = 4;
  double acc[JB][K], x[K], y[JB][K], pr[JB][K];
  for (int64_t j0 = jstart; j0 < n; j0 += JB) {
    const int jb = (int)((n - j0) < JB ? (n - j0) : JB);
    for (int b = 0; b < jb; ++b) sc_set_d<K>(0.0, acc[b]);
    for (int64_t t = 0; t < p; ++t) {
      const int64_t ia = ta ? (t * m + i) : (i * p + t);
      gather<K>(A, asz, ia, x);
      for (int b = 0; b < jb; ++b) {
        const int64_t j = j0 + b;
        const int64_t ib = tb ? (j * p + t) : (t * n + j);
        gather<K>(B, bsz, ib, y[b]);
      }
      for (int b = 0; b < jb; ++b) sc_mul<K>(x, y[b], pr[b]);
      for (int b = 0; b < jb; ++b) sc_add<K>(acc[b], pr[b], acc[b]);
    }
    for (int b = 0; b < jb; ++b)
      scatter<K>(C, csz, i * n + (j0 + b), acc[b]);
  }
}

template <int K>
static void t_gemm(int64_t m, int64_t p, int64_t n, const double *A,
                   const double *B, double *C, int ta, int tb) {
#ifdef XK_HAVE_AVX512
  if (n >= 8) {
    const int64_t asz = m * p, bsz = p * n, csz = m * n;
    const int64_t nv = n & ~(int64_t)7;
#pragma omp parallel for schedule(static) if (m * p * n >= 4096)
    for (int64_t i = 0; i < m; ++i) {
      __m512d acc[K], xv[K], yv[K], pr[K];
      double x[K];
      for (int64_t j0 = 0; j0 < nv; j0 += 8) {
        for (int l = 0; l < K; ++l) acc[l] = _mm512_setzero_pd();
        const __m512i jpidx = tb ? viota(j0 * p, p) : _mm512_setzero_si512();
        for (int64_t t = 0; t < p; ++t) {
          const int64_t ia = ta ? (t * m + i) : (i * p + t);
          gather<K>(A, asz, ia, x);
          vbcast_limbs<K>(x, xv);
          if (!tb) {
            vload<K>(B, bsz, t * n + j0, yv);
          } else {
            const __m512i idx =
                _mm512_add_epi64(jpidx, _mm512_set1_epi64(t));
            vgather<K>(B, bsz, idx, yv);
          }
          sc_mul<K, __m512d>(xv, yv, pr);
          sc_add<K, __m512d>(acc, pr, acc);
        }
        vstore<K>(C, csz, i * n + j0, acc);
      }
      if (nv < n) gemm_row_scalar<K>(i, nv, m, p, n, A, B, C, ta, tb);
    }
    return;
  }
#endif
#pragma omp parallel for schedule(static) if (m * p * n >= 4096)
  for (int64_t i = 0; i < m; ++i)
    gemm_row_scalar<K>(i, 0, m, p, n, A, B, C, ta, tb);
}

// C = A^T A (A: (p, n) row-major) -> C (n, n): only columns j >= i are
// computed (from the 8-aligned block containing i in the vector path; a
// few j < i lanes in that block are computed redundantly), then the
// strict lower triangle is mirrored from the upper.  ~2x fewer cascade
// ops than the general gemm for the Q = W^T W assembly, and the result
// is EXACTLY symmetric — the gemm's C[j,i] recomputes the commuted
// products, whose error-term sums can differ in the low limbs.  Computed
// entries are bit-identical to t_gemm(A, A, ta=1): same per-element
// accumulation sequence.
template <int K>
static void t_syrk(int64_t p, int64_t n, const double *A, double *C) {
  const int64_t asz = p * n, csz = n * n;
#ifdef XK_HAVE_AVX512
  if (n >= 8) {
    const int64_t nv = n & ~(int64_t)7;
    // dynamic schedule: row i owns n - (i & ~7) output columns, so work
    // decreases down the rows (disjoint writes; order-independent)
#pragma omp parallel for schedule(dynamic, 4) if (n * n * p >= 8192)
    for (int64_t i = 0; i < n; ++i) {
      __m512d acc[K], xv[K], yv[K], pr[K];
      double x[K];
      for (int64_t j0 = i & ~(int64_t)7; j0 < nv; j0 += 8) {
        for (int l = 0; l < K; ++l) acc[l] = _mm512_setzero_pd();
        for (int64_t t = 0; t < p; ++t) {
          gather<K>(A, asz, t * n + i, x);
          vbcast_limbs<K>(x, xv);
          vload<K>(A, asz, t * n + j0, yv);
          sc_mul<K, __m512d>(xv, yv, pr);
          sc_add<K, __m512d>(acc, pr, acc);
        }
        vstore<K>(C, csz, i * n + j0, acc);
      }
      if (nv < n)
        gemm_row_scalar<K>(i, nv > i ? nv : i, n, p, n, A, A, C, 1, 0);
    }
  } else
#endif
  {
#pragma omp parallel for schedule(dynamic, 4) if (n * n * p >= 4096)
    for (int64_t i = 0; i < n; ++i)
      gemm_row_scalar<K>(i, i, n, p, n, A, A, C, 1, 0);
  }
  for (int l = 0; l < K; ++l) {
    double *Cl = C + (int64_t)l * csz;
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = i + 1; j < n; ++j) Cl[j * n + i] = Cl[i * n + j];
  }
}

// Cholesky: A (k, n, n) symmetric -> L lower (k, n, n); returns 1 if ok,
// 0 if a pivot is <= 0 (not numerically SPD at this precision -- caller
// escalates per the reference ladder, MPMP.jl:762-801).
// The column update below the diagonal (rows i > j) is elementwise-
// independent across i: AVX-512 runs 8 rows per lane-group (strided
// gathers over L's row-major rows; identical op sequence per row).
template <int K>
static int t_cholesky(int64_t n, const double *A, double *L) {
  const int64_t sz = n * n;
  std::memset(L, 0, sizeof(double) * (size_t)(K * sz));
  double s[K], t[K], x[K], y[K], d[K];
  for (int64_t j = 0; j < n; ++j) {
    gather<K>(A, sz, j * n + j, d);
    for (int64_t t2 = 0; t2 < j; ++t2) {
      gather<K>(L, sz, j * n + t2, x);
      sc_mul<K>(x, x, s);
      sc_sub<K>(d, s, d);
    }
    if (d[0] <= 0.0) return 0;
    sc_sqrt<K>(d, t);
    scatter<K>(L, sz, j * n + j, t);
    double inv_t[K];
    sc_recip<K>(t, inv_t);
    int64_t i = j + 1;
#ifdef XK_HAVE_AVX512
    {
      // rows below the diagonal are independent for fixed j: 8 rows per
      // lane-group, lane-groups across OpenMP threads
      const int64_t nblk = (n - i) / 8;
#pragma omp parallel for schedule(static) if (nblk >= 2 && n >= 48)
      for (int64_t bi = 0; bi < nblk; ++bi) {
        __m512d sv[K], xv[K], yv[K], pr[K], iv[K];
        vbcast_limbs<K>(inv_t, iv);
        double yb[K];
        const int64_t ib = j + 1 + bi * 8;
        const __m512i rowbase = viota(ib * n, n);
        vgather<K>(A, sz, _mm512_add_epi64(rowbase, _mm512_set1_epi64(j)),
                   sv);
        for (int64_t t2 = 0; t2 < j; ++t2) {
          vgather<K>(L, sz,
                     _mm512_add_epi64(rowbase, _mm512_set1_epi64(t2)), xv);
          gather<K>(L, sz, j * n + t2, yb);
          vbcast_limbs<K>(yb, yv);
          sc_mul<K, __m512d>(xv, yv, pr);
          sc_sub<K, __m512d>(sv, pr, sv);
        }
        sc_mul<K, __m512d>(sv, iv, sv);
        vscatter<K>(L, sz, _mm512_add_epi64(rowbase, _mm512_set1_epi64(j)),
                    sv);
      }
      i += nblk * 8;
    }
#endif
    for (; i < n; ++i) {
      gather<K>(A, sz, i * n + j, s);
      for (int64_t t2 = 0; t2 < j; ++t2) {
        gather<K>(L, sz, i * n + t2, x);
        gather<K>(L, sz, j * n + t2, y);
        double pr[K];
        sc_mul<K>(x, y, pr);
        sc_sub<K>(s, pr, s);
      }
      sc_mul<K>(s, inv_t, s);
      scatter<K>(L, sz, i * n + j, s);
    }
  }
  return 1;
}

// scalar triangular-solve body over columns [c0, c1) of B/X
template <int K>
static inline void trsm_lower_cols(int64_t n, int64_t m, const double *L,
                                   const double *B, double *X, int trans,
                                   int unit, int64_t c0, int64_t c1) {
  const int64_t lsz = n * n, bsz = n * m;
  for (int64_t c = c0; c < c1; ++c) {
    double s[K], x[K], y[K], pr[K], r[K];
    if (!trans) {
      for (int64_t i = 0; i < n; ++i) {
        gather<K>(B, bsz, i * m + c, s);
        for (int64_t t = 0; t < i; ++t) {
          gather<K>(L, lsz, i * n + t, x);
          gather<K>(X, bsz, t * m + c, y);
          sc_mul<K>(x, y, pr);
          sc_sub<K>(s, pr, s);
        }
        if (!unit) {
          gather<K>(L, lsz, i * n + i, x);
          sc_recip<K>(x, r);
          sc_div_with_recip<K>(s, x, r, s);
        }
        scatter<K>(X, bsz, i * m + c, s);
      }
    } else {
      for (int64_t i = n - 1; i >= 0; --i) {
        gather<K>(B, bsz, i * m + c, s);
        for (int64_t t = i + 1; t < n; ++t) {
          gather<K>(L, lsz, t * n + i, x);  // L^T[i,t] = L[t,i]
          gather<K>(X, bsz, t * m + c, y);
          sc_mul<K>(x, y, pr);
          sc_sub<K>(s, pr, s);
        }
        if (!unit) {
          gather<K>(L, lsz, i * n + i, x);
          sc_recip<K>(x, r);
          sc_div_with_recip<K>(s, x, r, s);
        }
        scatter<K>(X, bsz, i * m + c, s);
      }
    }
  }
}

template <int K>
static void t_trsm_lower(int64_t n, int64_t m, const double *L,
                         const double *B, double *X, int trans, int unit) {
  const int64_t lsz = n * n, bsz = n * m;
#ifdef XK_HAVE_AVX512
  if (m >= 8) {
    const int64_t mv = m & ~(int64_t)7;
#pragma omp parallel for schedule(static) if (n * n * mv >= 8192)
    for (int64_t c0 = 0; c0 < mv; c0 += 8) {
      __m512d sv[K], xv[K], yv[K], pr[K], bv[K], rv[K];
      double x[K], r[K];
      if (!trans) {
        for (int64_t i = 0; i < n; ++i) {
          vload<K>(B, bsz, i * m + c0, sv);
          for (int64_t t = 0; t < i; ++t) {
            gather<K>(L, lsz, i * n + t, x);
            vbcast_limbs<K>(x, xv);
            vload<K>(X, bsz, t * m + c0, yv);
            sc_mul<K, __m512d>(xv, yv, pr);
            sc_sub<K, __m512d>(sv, pr, sv);
          }
          if (!unit) {
            gather<K>(L, lsz, i * n + i, x);
            sc_recip<K>(x, r);
            vbcast_limbs<K>(x, bv);
            vbcast_limbs<K>(r, rv);
            sc_div_with_recip<K, __m512d>(sv, bv, rv, sv);
          }
          vstore<K>(X, bsz, i * m + c0, sv);
        }
      } else {
        for (int64_t i = n - 1; i >= 0; --i) {
          vload<K>(B, bsz, i * m + c0, sv);
          for (int64_t t = i + 1; t < n; ++t) {
            gather<K>(L, lsz, t * n + i, x);  // L^T[i,t] = L[t,i]
            vbcast_limbs<K>(x, xv);
            vload<K>(X, bsz, t * m + c0, yv);
            sc_mul<K, __m512d>(xv, yv, pr);
            sc_sub<K, __m512d>(sv, pr, sv);
          }
          if (!unit) {
            gather<K>(L, lsz, i * n + i, x);
            sc_recip<K>(x, r);
            vbcast_limbs<K>(x, bv);
            vbcast_limbs<K>(r, rv);
            sc_div_with_recip<K, __m512d>(sv, bv, rv, sv);
          }
          vstore<K>(X, bsz, i * m + c0, sv);
        }
      }
    }
    if (mv < m) trsm_lower_cols<K>(n, m, L, B, X, trans, unit, mv, m);
    return;
  }
#endif
#pragma omp parallel for schedule(static) if (n * n * m >= 8192)
  for (int64_t c = 0; c < m; ++c)
    trsm_lower_cols<K>(n, m, L, B, X, trans, unit, c, c + 1);
}

template <int K>
static inline void trsm_upper_cols(int64_t n, int64_t m, const double *U,
                                   const double *B, double *X, int unit,
                                   int64_t c0, int64_t c1) {
  const int64_t usz = n * n, bsz = n * m;
  for (int64_t c = c0; c < c1; ++c) {
    double s[K], x[K], y[K], pr[K], r[K];
    for (int64_t i = n - 1; i >= 0; --i) {
      gather<K>(B, bsz, i * m + c, s);
      for (int64_t t = i + 1; t < n; ++t) {
        gather<K>(U, usz, i * n + t, x);
        gather<K>(X, bsz, t * m + c, y);
        sc_mul<K>(x, y, pr);
        sc_sub<K>(s, pr, s);
      }
      if (!unit) {
        gather<K>(U, usz, i * n + i, x);
        sc_recip<K>(x, r);
        sc_div_with_recip<K>(s, x, r, s);
      }
      scatter<K>(X, bsz, i * m + c, s);
    }
  }
}

template <int K>
static void t_trsm_upper(int64_t n, int64_t m, const double *U,
                         const double *B, double *X, int unit) {
  const int64_t usz = n * n, bsz = n * m;
#ifdef XK_HAVE_AVX512
  if (m >= 8) {
    const int64_t mv = m & ~(int64_t)7;
#pragma omp parallel for schedule(static) if (n * n * mv >= 8192)
    for (int64_t c0 = 0; c0 < mv; c0 += 8) {
      __m512d sv[K], xv[K], yv[K], pr[K], bv[K], rv[K];
      double x[K], r[K];
      for (int64_t i = n - 1; i >= 0; --i) {
        vload<K>(B, bsz, i * m + c0, sv);
        for (int64_t t = i + 1; t < n; ++t) {
          gather<K>(U, usz, i * n + t, x);
          vbcast_limbs<K>(x, xv);
          vload<K>(X, bsz, t * m + c0, yv);
          sc_mul<K, __m512d>(xv, yv, pr);
          sc_sub<K, __m512d>(sv, pr, sv);
        }
        if (!unit) {
          gather<K>(U, usz, i * n + i, x);
          sc_recip<K>(x, r);
          vbcast_limbs<K>(x, bv);
          vbcast_limbs<K>(r, rv);
          sc_div_with_recip<K, __m512d>(sv, bv, rv, sv);
        }
        vstore<K>(X, bsz, i * m + c0, sv);
      }
    }
    if (mv < m) trsm_upper_cols<K>(n, m, U, B, X, unit, mv, m);
    return;
  }
#endif
#pragma omp parallel for schedule(static) if (n * n * m >= 8192)
  for (int64_t c = 0; c < m; ++c)
    trsm_upper_cols<K>(n, m, U, B, X, unit, c, c + 1);
}

// LU with partial pivoting (pivot by |hi limb|), packed LU + perm.
// Replaces Arblib.approx_lu! (MPMP.jl:1436, 1501).  The rank-1 trailing
// update is elementwise-independent across columns c (contiguous in the
// row-major slabs): AVX-512 runs 8 columns per lane-group.
template <int K>
static int t_lu(int64_t n, const double *A, double *LU, int64_t *perm) {
  const int64_t sz = n * n;
  std::memcpy(LU, A, sizeof(double) * (size_t)(K * sz));
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  double piv[K], ipiv[K];
  for (int64_t j = 0; j < n; ++j) {
    int64_t pm = j;
    double best = std::fabs(LU[j * n + j]);  // hi limb slab
    for (int64_t i = j + 1; i < n; ++i) {
      double v = std::fabs(LU[i * n + j]);
      if (v > best) {
        best = v;
        pm = i;
      }
    }
    if (best == 0.0) return 0;
    if (pm != j) {
      for (int l = 0; l < K; ++l) {
        double *slab = LU + (int64_t)l * sz;
        for (int64_t c = 0; c < n; ++c) {
          double tmp = slab[j * n + c];
          slab[j * n + c] = slab[pm * n + c];
          slab[pm * n + c] = tmp;
        }
      }
      int64_t tp = perm[j];
      perm[j] = perm[pm];
      perm[pm] = tp;
    }
    gather<K>(LU, sz, j * n + j, piv);
    sc_recip<K>(piv, ipiv);
    // trailing rows are independent for fixed j: parallel across rows,
    // AVX-512 across the (contiguous) trailing columns of each row
#pragma omp parallel for schedule(static) if (n - j >= 16)
    for (int64_t i = j + 1; i < n; ++i) {
      double xr[K], yr[K], prr[K];
      gather<K>(LU, sz, i * n + j, xr);
      sc_mul<K>(xr, ipiv, xr);  // multiplier
      scatter<K>(LU, sz, i * n + j, xr);
      int64_t c = j + 1;
#ifdef XK_HAVE_AVX512
      {
        __m512d xv[K], yv[K], pv[K], cv[K];
        vbcast_limbs<K>(xr, xv);
        for (; c + 8 <= n; c += 8) {
          vload<K>(LU, sz, j * n + c, yv);
          sc_mul<K, __m512d>(xv, yv, pv);
          vload<K>(LU, sz, i * n + c, cv);
          sc_sub<K, __m512d>(cv, pv, cv);
          vstore<K>(LU, sz, i * n + c, cv);
        }
      }
#endif
      for (; c < n; ++c) {
        gather<K>(LU, sz, j * n + c, yr);
        sc_mul<K>(xr, yr, prr);
        double cur[K];
        gather<K>(LU, sz, i * n + c, cur);
        sc_sub<K>(cur, prr, cur);
        scatter<K>(LU, sz, i * n + c, cur);
      }
    }
  }
  return 1;
}

// dispatch helper: expands a call for every supported K
#define XK_DISPATCH(K_, CALL)                          \
  switch (K_) {                                        \
    case 1: { constexpr int TK = 1; CALL; break; }     \
    case 2: { constexpr int TK = 2; CALL; break; }     \
    case 3: { constexpr int TK = 3; CALL; break; }     \
    case 4: { constexpr int TK = 4; CALL; break; }     \
    case 5: { constexpr int TK = 5; CALL; break; }     \
    case 6: { constexpr int TK = 6; CALL; break; }     \
    case 7: { constexpr int TK = 7; CALL; break; }     \
    case 8: { constexpr int TK = 8; CALL; break; }     \
    case 9: { constexpr int TK = 9; CALL; break; }     \
    case 10: { constexpr int TK = 10; CALL; break; }   \
    case 11: { constexpr int TK = 11; CALL; break; }   \
    case 12: { constexpr int TK = 12; CALL; break; }   \
    case 13: { constexpr int TK = 13; CALL; break; }   \
    case 14: { constexpr int TK = 14; CALL; break; }   \
    case 15: { constexpr int TK = 15; CALL; break; }   \
    case 16: { constexpr int TK = 16; CALL; break; }   \
    default: break;                                    \
  }

}  // namespace

extern "C" {

void xk_add(int k, int64_t n, const double *a, const double *b, double *out) {
  XK_DISPATCH(k, t_add<TK>(n, a, b, out));
}

void xk_sub(int k, int64_t n, const double *a, const double *b, double *out) {
  XK_DISPATCH(k, t_sub<TK>(n, a, b, out));
}

void xk_mul(int k, int64_t n, const double *a, const double *b, double *out) {
  XK_DISPATCH(k, t_mul<TK>(n, a, b, out));
}

void xk_div(int k, int64_t n, const double *a, const double *b, double *out) {
  XK_DISPATCH(k, t_div<TK>(n, a, b, out));
}

void xk_sqrt(int k, int64_t n, const double *a, double *out) {
  XK_DISPATCH(k, t_sqrt<TK>(n, a, out));
}

void xk_scale(int k, int64_t n, const double *a, const double *s,
              double *out) {
  XK_DISPATCH(k, t_scale<TK>(n, a, s, out));
}

void xk_sum(int k, int64_t n, const double *a, double *out) {
  XK_DISPATCH(k, t_sum<TK>(n, a, out));
}

void xk_dot(int k, int64_t n, const double *a, const double *b, double *out) {
  XK_DISPATCH(k, t_dot<TK>(n, a, b, out));
}

// max |value| over elements (the hi-limb slab carries the magnitude)
double xk_max_abs(int k, int64_t n, const double *a) {
  (void)k;
  double m = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    double v = std::fabs(a[i]);
    if (v > m) m = v;
  }
  return m;
}

void xk_gemm(int k, int64_t m, int64_t p, int64_t n, const double *A,
             const double *B, double *C, int ta, int tb) {
  XK_DISPATCH(k, t_gemm<TK>(m, p, n, A, B, C, ta, tb));
}

void xk_syrk(int k, int64_t p, int64_t n, const double *A, double *C) {
  XK_DISPATCH(k, t_syrk<TK>(p, n, A, C));
}

int xk_cholesky(int k, int64_t n, const double *A, double *L) {
  int rc = 0;
  XK_DISPATCH(k, rc = t_cholesky<TK>(n, A, L));
  return rc;
}

void xk_trsm_lower(int k, int64_t n, int64_t m, const double *L,
                   const double *B, double *X, int trans, int unit) {
  XK_DISPATCH(k, t_trsm_lower<TK>(n, m, L, B, X, trans, unit));
}

void xk_trsm_upper(int k, int64_t n, int64_t m, const double *U,
                   const double *B, double *X, int unit) {
  XK_DISPATCH(k, t_trsm_upper<TK>(n, m, U, B, X, unit));
}

int xk_lu(int k, int64_t n, const double *A, double *LU, int64_t *perm) {
  int rc = 0;
  XK_DISPATCH(k, rc = t_lu<TK>(n, A, LU, perm));
  return rc;
}

void xk_lu_solve(int k, int64_t n, int64_t m, const double *LU,
                 const int64_t *perm, const double *B, double *X) {
  const int64_t bsz = n * m;
  double *PB = new double[(size_t)(k * bsz)];
  for (int l = 0; l < k; ++l) {
    const double *bs = B + (int64_t)l * bsz;
    double *ps = PB + (int64_t)l * bsz;
    for (int64_t i = 0; i < n; ++i)
      std::memcpy(ps + i * m, bs + perm[i] * m, sizeof(double) * (size_t)m);
  }
  double *Y = new double[(size_t)(k * bsz)];
  xk_trsm_lower(k, n, m, LU, PB, Y, /*trans=*/0, /*unit=*/1);
  xk_trsm_upper(k, n, m, LU, Y, X, /*unit=*/0);
  delete[] PB;
  delete[] Y;
}

}  // extern "C"

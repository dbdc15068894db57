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
// Array layout: limb-major C-contiguous, shape (k, n) for n elements —
// limb l of element i at a[l*n + i] — matching XF.limbs / numpy.
//
// Build: g++ -O3 -march=native -ffp-contract=off -fopenmp -shared -fPIC
// (-ffp-contract=off: EFTs need exact IEEE ops; FMA is used EXPLICITLY
// via std::fma where wanted, never by contraction.)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int KMAX = 16;

static inline void two_sum(double a, double b, double &s, double &e) {
  s = a + b;
  double bb = s - a;
  e = (a - (s - bb)) + (b - bb);
}

static inline void fast_two_sum(double a, double b, double &s, double &e) {
  s = a + b;
  e = b - (s - a);
}

// exact product via hardware FMA: p = fl(a*b), e = fma(a,b,-p)
static inline void two_prod(double a, double b, double &p, double &e) {
  p = a * b;
  e = std::fma(a, b, -p);
}

// VecSum (Ogita-Rump-Oishi): exact transform, leading approx first.
// In-place over t[0..n-1].
static inline void vec_sum(double *t, int n) {
  double s = t[n - 1];
  for (int i = n - 2; i >= 0; --i) {
    double e;
    two_sum(t[i], s, s, e);
    t[i + 1] = e;
  }
  t[0] = s;
}

// k-limb add: per-order error cascades (ops/xfloat.py _cascade_add).
// out may alias a or b.
static inline void sc_add(int k, const double *a, const double *b,
                          double *out) {
  if (k == 1) {
    out[0] = a[0] + b[0];
    return;
  }
  double s[KMAX], e[KMAX], carry[2 * KMAX], vals[KMAX + 1];
  for (int i = 0; i < k - 1; ++i) two_sum(a[i], b[i], s[i], e[i]);
  // per-order folds
  vals[0] = s[0];
  int nc = 1;
  carry[0] = e[0];
  for (int i = 1; i < k - 1; ++i) {
    double v = s[i];
    double nxt[2 * KMAX];
    int nn = 0;
    for (int c = 0; c < nc; ++c) {
      double g;
      two_sum(v, carry[c], v, g);
      nxt[nn++] = g;
    }
    vals[i] = v;
    nxt[nn++] = e[i];
    nc = nn;
    std::memcpy(carry, nxt, sizeof(double) * nc);
  }
  double top = a[k - 1] + b[k - 1];
  for (int c = 0; c < nc; ++c) top += carry[c];
  vals[k - 1] = top;
  // renormalization chain + VecSum pull-up (canonical leading limbs)
  double r[KMAX + 1];
  double hi, err;
  two_sum(vals[0], vals[1], hi, err);
  r[0] = hi;
  for (int i = 2; i < k; ++i) {
    two_sum(err, vals[i], hi, err);
    r[i - 1] = hi;
  }
  r[k - 1] = err;
  vec_sum(r, k);
  std::memcpy(out, r, sizeof(double) * k);
}

// k-limb multiply: per-order cascades (ops/xfloat.py _cascade_mul).
static inline void sc_mul(int k, const double *a, const double *b,
                          double *out) {
  if (k == 1) {
    out[0] = a[0] * b[0];
    return;
  }
  // groups[o] holds terms of order o: (o+1 products) + (o product errors
  // from order o-1) + (fold errors, gn[o-1]-1 of them) — the recurrence
  // gn[o] = gn[o-1] + 2o gives gn[o] = 1 + o(o+1), so the cap must cover
  // 1 + (KMAX-1)KMAX.
  constexpr int CAP = KMAX * (KMAX + 1) + 8;
  double groups[KMAX][CAP];
  int gn[KMAX];
  for (int o = 0; o < k; ++o) gn[o] = 0;
  for (int o = 0; o < k - 1; ++o) {
    for (int i = 0; i <= o; ++i) {
      int j = o - i;
      if (i < k && j < k) {
        double p, e;
        two_prod(a[i], b[j], p, e);
        groups[o][gn[o]++] = p;
        if (o + 1 < k) groups[o + 1][gn[o + 1]++] = e;
      }
    }
  }
  double cheap = 0.0;
  for (int o = k - 1; o <= k; ++o) {
    for (int i = 0; i <= o; ++i) {
      int j = o - i;
      if (i < k && j < k) cheap += a[i] * b[j];
    }
  }
  groups[k - 1][gn[k - 1]++] = cheap;
  double vals[KMAX];
  for (int o = 0; o < k; ++o) {
    if (gn[o] == 0) {
      vals[o] = 0.0;
      continue;
    }
    double v = groups[o][0];
    for (int t = 1; t < gn[o]; ++t) {
      if (o == k - 1) {
        v += groups[o][t];  // below last-limb ulp
      } else {
        double g;
        two_sum(v, groups[o][t], v, g);
        groups[o + 1][gn[o + 1]++] = g;
      }
    }
    vals[o] = v;
  }
  double r[KMAX + 1];
  double hi, err;
  two_sum(vals[0], vals[1], hi, err);
  r[0] = hi;
  for (int i = 2; i < k; ++i) {
    two_sum(err, vals[i], hi, err);
    r[i - 1] = hi;
  }
  r[k - 1] = err;
  vec_sum(r, k);
  std::memcpy(out, r, sizeof(double) * k);
}

static inline void sc_neg(int k, const double *a, double *out) {
  for (int i = 0; i < k; ++i) out[i] = -a[i];
}

static inline void sc_sub(int k, const double *a, const double *b,
                          double *out) {
  double nb[KMAX];
  sc_neg(k, b, nb);
  sc_add(k, a, nb, out);
}

static inline void sc_set_d(int k, double v, double *out) {
  out[0] = v;
  for (int i = 1; i < k; ++i) out[i] = 0.0;
}

// Newton reciprocal (ops/xfloat.py xf_reciprocal): doubles correct bits
// per step; ceil(log2 k) + 1 steps from the f64 seed.
static inline void sc_recip(int k, const double *b, double *out) {
  double x[KMAX], e[KMAX], t[KMAX], one[KMAX];
  sc_set_d(k, 1.0 / b[0], x);
  sc_set_d(k, 1.0, one);
  int iters = 1;
  while ((1 << iters) < k) ++iters;  // ceil(log2 k)
  iters += 1;
  if (iters < 1) iters = 1;
  for (int it = 0; it < iters; ++it) {
    sc_mul(k, b, x, t);
    sc_sub(k, one, t, e);   // e = 1 - b*x
    sc_mul(k, x, e, t);
    sc_add(k, x, t, x);     // x += x*e
  }
  std::memcpy(out, x, sizeof(double) * k);
}

static inline void sc_div(int k, const double *a, const double *b,
                          double *out) {
  if (k == 1) {
    out[0] = a[0] / b[0];
    return;
  }
  double r[KMAX], q[KMAX], t[KMAX], res[KMAX];
  sc_recip(k, b, r);
  sc_mul(k, a, r, q);
  // refinement: q += (a - b*q) * r
  sc_mul(k, b, q, t);
  sc_sub(k, a, t, res);
  sc_mul(k, res, r, t);
  sc_add(k, q, t, out);
}

// sqrt via Newton on rsqrt (ops/xfloat.py xf_sqrt); a >= 0 (0 allowed).
static inline void sc_sqrt(int k, const double *a, double *out) {
  if (a[0] <= 0.0) {
    sc_set_d(k, a[0] == 0.0 ? 0.0 : std::nan(""), out);
    return;
  }
  if (k == 1) {
    out[0] = std::sqrt(a[0]);
    return;
  }
  double x[KMAX], e[KMAX], t[KMAX], u[KMAX], one[KMAX], half[KMAX], s[KMAX];
  sc_set_d(k, 1.0 / std::sqrt(a[0]), x);
  sc_set_d(k, 1.0, one);
  sc_set_d(k, 0.5, half);
  int iters = 1;
  while ((1 << iters) < k) ++iters;
  iters += 1;
  for (int it = 0; it < iters; ++it) {
    sc_mul(k, x, x, t);
    sc_mul(k, a, t, u);
    sc_sub(k, one, u, e);     // e = 1 - a*x*x
    sc_mul(k, x, e, t);
    sc_mul(k, half, t, u);
    sc_add(k, x, u, x);       // x += 0.5*x*e
  }
  sc_mul(k, a, x, s);         // s = a * rsqrt(a)
  // refinement: s += (a - s*s) * x / 2
  sc_mul(k, s, s, t);
  sc_sub(k, a, t, e);
  sc_mul(k, e, x, t);
  sc_mul(k, half, t, u);
  sc_add(k, s, u, out);
}

// value sign from the leading nonzero limb (limbs nonoverlapping)
static inline int sc_sign(int k, const double *a) {
  for (int i = 0; i < k; ++i) {
    if (a[i] != 0.0) return a[i] < 0.0 ? -1 : 1;
  }
  return 0;
}

// ---- strided element access helpers ----
// Arrays are (k, n) limb-major: limb l of element i at base[l*n + i].

static inline void gather(int k, const double *base, int64_t n, int64_t i,
                          double *buf) {
  for (int l = 0; l < k; ++l) buf[l] = base[(int64_t)l * n + i];
}

static inline void scatter(int k, double *base, int64_t n, int64_t i,
                           const double *buf) {
  for (int l = 0; l < k; ++l) base[(int64_t)l * n + i] = buf[l];
}

}  // namespace

extern "C" {

// ---- elementwise array ops over n elements ----

void xk_add(int k, int64_t n, const double *a, const double *b, double *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x[KMAX], y[KMAX], z[KMAX];
    gather(k, a, n, i, x);
    gather(k, b, n, i, y);
    sc_add(k, x, y, z);
    scatter(k, out, n, i, z);
  }
}

void xk_sub(int k, int64_t n, const double *a, const double *b, double *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x[KMAX], y[KMAX], z[KMAX];
    gather(k, a, n, i, x);
    gather(k, b, n, i, y);
    sc_sub(k, x, y, z);
    scatter(k, out, n, i, z);
  }
}

void xk_mul(int k, int64_t n, const double *a, const double *b, double *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x[KMAX], y[KMAX], z[KMAX];
    gather(k, a, n, i, x);
    gather(k, b, n, i, y);
    sc_mul(k, x, y, z);
    scatter(k, out, n, i, z);
  }
}

void xk_div(int k, int64_t n, const double *a, const double *b, double *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x[KMAX], y[KMAX], z[KMAX];
    gather(k, a, n, i, x);
    gather(k, b, n, i, y);
    sc_div(k, x, y, z);
    scatter(k, out, n, i, z);
  }
}

void xk_sqrt(int k, int64_t n, const double *a, double *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x[KMAX], z[KMAX];
    gather(k, a, n, i, x);
    sc_sqrt(k, x, z);
    scatter(k, out, n, i, z);
  }
}

// out = a * s where s is ONE k-limb scalar (limbs contiguous, length k)
void xk_scale(int k, int64_t n, const double *a, const double *s,
              double *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x[KMAX], z[KMAX];
    gather(k, a, n, i, x);
    sc_mul(k, x, s, z);
    scatter(k, out, n, i, z);
  }
}

// sequential exact-cascade sum of n elements -> one k-limb scalar
void xk_sum(int k, int64_t n, const double *a, double *out) {
  double acc[KMAX], x[KMAX];
  sc_set_d(k, 0.0, acc);
  for (int64_t i = 0; i < n; ++i) {
    gather(k, a, n, i, x);
    sc_add(k, acc, x, acc);
  }
  std::memcpy(out, acc, sizeof(double) * k);
}

// dot product of two flat (k, n) arrays -> one k-limb scalar
void xk_dot(int k, int64_t n, const double *a, const double *b, double *out) {
  double acc[KMAX], x[KMAX], y[KMAX], p[KMAX];
  sc_set_d(k, 0.0, acc);
  for (int64_t i = 0; i < n; ++i) {
    gather(k, a, n, i, x);
    gather(k, b, n, i, y);
    sc_mul(k, x, y, p);
    sc_add(k, acc, p, acc);
  }
  std::memcpy(out, acc, sizeof(double) * k);
}

// max |value| over elements (hi limb dominates the magnitude)
double xk_max_abs(int k, int64_t n, const double *a) {
  double m = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    double v = std::fabs(a[i]);  // limb 0 slab is the first n doubles
    if (v > m) m = v;
  }
  return m;
}

// ---- matrix kernels ----
// A: (k, m, p), B: (k, p, n), C: (k, m, n), all limb-major contiguous.
// ta/tb: transpose flags — A is stored (k, p, m) when ta, etc.

void xk_gemm(int k, int64_t m, int64_t p, int64_t n, const double *A,
             const double *B, double *C, int ta, int tb) {
  const int64_t asz = m * p, bsz = p * n, csz = m * n;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < m; ++i) {
    double acc[KMAX], x[KMAX], y[KMAX], pr[KMAX];
    for (int64_t j = 0; j < n; ++j) {
      sc_set_d(k, 0.0, acc);
      for (int64_t t = 0; t < p; ++t) {
        const int64_t ia = ta ? (t * m + i) : (i * p + t);
        const int64_t ib = tb ? (j * p + t) : (t * n + j);
        gather(k, A, asz, ia, x);
        gather(k, B, bsz, ib, y);
        sc_mul(k, x, y, pr);
        sc_add(k, acc, pr, acc);
      }
      scatter(k, C, csz, i * n + j, acc);
    }
  }
}

// Cholesky: A (k, n, n) symmetric -> L lower (k, n, n); returns 1 if ok,
// 0 if a pivot is <= 0 (not numerically SPD at this precision — caller
// escalates per the reference ladder, MPMP.jl:762-801).
int xk_cholesky(int k, int64_t n, const double *A, double *L) {
  const int64_t sz = n * n;
  std::memset(L, 0, sizeof(double) * (size_t)(k * sz));
  double s[KMAX], t[KMAX], x[KMAX], y[KMAX], d[KMAX];
  for (int64_t j = 0; j < n; ++j) {
    // d = A[j,j] - sum_t L[j,t]^2
    gather(k, A, sz, j * n + j, d);
    for (int64_t t2 = 0; t2 < j; ++t2) {
      gather(k, L, sz, j * n + t2, x);
      sc_mul(k, x, x, s);
      sc_sub(k, d, s, d);
    }
    if (d[0] <= 0.0) return 0;
    sc_sqrt(k, d, t);
    scatter(k, L, sz, j * n + j, t);
    double inv_t[KMAX];
    sc_recip(k, t, inv_t);
    for (int64_t i = j + 1; i < n; ++i) {
      gather(k, A, sz, i * n + j, s);
      for (int64_t t2 = 0; t2 < j; ++t2) {
        gather(k, L, sz, i * n + t2, x);
        gather(k, L, sz, j * n + t2, y);
        double pr[KMAX];
        sc_mul(k, x, y, pr);
        sc_sub(k, s, pr, s);
      }
      sc_mul(k, s, inv_t, s);
      scatter(k, L, sz, i * n + j, s);
    }
  }
  return 1;
}

// Solve op(L) X = B with L lower-triangular (k, n, n), B (k, n, m).
// trans: 0 solve L X = B (forward), 1 solve L^T X = B (backward).
// unit: diagonal treated as 1.
void xk_trsm_lower(int k, int64_t n, int64_t m, const double *L,
                   const double *B, double *X, int trans, int unit) {
  const int64_t lsz = n * n, bsz = n * m;
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < m; ++c) {
    double s[KMAX], x[KMAX], y[KMAX], pr[KMAX];
    if (!trans) {
      for (int64_t i = 0; i < n; ++i) {
        gather(k, B, bsz, i * m + c, s);
        for (int64_t t = 0; t < i; ++t) {
          gather(k, L, lsz, i * n + t, x);
          gather(k, X, bsz, t * m + c, y);
          sc_mul(k, x, y, pr);
          sc_sub(k, s, pr, s);
        }
        if (!unit) {
          gather(k, L, lsz, i * n + i, x);
          sc_div(k, s, x, s);
        }
        scatter(k, X, bsz, i * m + c, s);
      }
    } else {
      for (int64_t i = n - 1; i >= 0; --i) {
        gather(k, B, bsz, i * m + c, s);
        for (int64_t t = i + 1; t < n; ++t) {
          gather(k, L, lsz, t * n + i, x);  // L^T[i,t] = L[t,i]
          gather(k, X, bsz, t * m + c, y);
          sc_mul(k, x, y, pr);
          sc_sub(k, s, pr, s);
        }
        if (!unit) {
          gather(k, L, lsz, i * n + i, x);
          sc_div(k, s, x, s);
        }
        scatter(k, X, bsz, i * m + c, s);
      }
    }
  }
}

// Solve U X = B with U upper-triangular (back substitution).
void xk_trsm_upper(int k, int64_t n, int64_t m, const double *U,
                   const double *B, double *X, int unit) {
  const int64_t usz = n * n, bsz = n * m;
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < m; ++c) {
    double s[KMAX], x[KMAX], y[KMAX], pr[KMAX];
    for (int64_t i = n - 1; i >= 0; --i) {
      gather(k, B, bsz, i * m + c, s);
      for (int64_t t = i + 1; t < n; ++t) {
        gather(k, U, usz, i * n + t, x);
        gather(k, X, bsz, t * m + c, y);
        sc_mul(k, x, y, pr);
        sc_sub(k, s, pr, s);
      }
      if (!unit) {
        gather(k, U, usz, i * n + i, x);
        sc_div(k, s, x, s);
      }
      scatter(k, X, bsz, i * m + c, s);
    }
  }
}

// LU with partial pivoting (pivot by |hi limb|), in place over a copy:
// LU (k, n, n) packed, perm int64 (n).  Returns 1 ok, 0 singular.
// Replaces Arblib.approx_lu! (MPMP.jl:1436, 1501).
int xk_lu(int k, int64_t n, const double *A, double *LU, int64_t *perm) {
  const int64_t sz = n * n;
  std::memcpy(LU, A, sizeof(double) * (size_t)(k * sz));
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  double x[KMAX], y[KMAX], pr[KMAX], piv[KMAX], ipiv[KMAX];
  for (int64_t j = 0; j < n; ++j) {
    // pivot row
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
      for (int l = 0; l < k; ++l) {
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
    gather(k, LU, sz, j * n + j, piv);
    sc_recip(k, piv, ipiv);
    for (int64_t i = j + 1; i < n; ++i) {
      gather(k, LU, sz, i * n + j, x);
      sc_mul(k, x, ipiv, x);  // multiplier
      scatter(k, LU, sz, i * n + j, x);
      for (int64_t c = j + 1; c < n; ++c) {
        gather(k, LU, sz, j * n + c, y);
        sc_mul(k, x, y, pr);
        double cur[KMAX];
        gather(k, LU, sz, i * n + c, cur);
        sc_sub(k, cur, pr, cur);
        scatter(k, LU, sz, i * n + c, cur);
      }
    }
  }
  return 1;
}

// Solve A X = B from packed LU + perm; B (k, n, m) -> X (k, n, m).
void xk_lu_solve(int k, int64_t n, int64_t m, const double *LU,
                 const int64_t *perm, const double *B, double *X) {
  const int64_t bsz = n * m;
  // PB: permuted rows of B
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

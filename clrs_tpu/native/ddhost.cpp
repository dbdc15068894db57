// Native host-side double-double linear algebra for problem setup.
//
// The reference delegates its entire numerical substrate to native C
// libraries (Arb/FLINT/GMP/MPFR via Arblib, MPMP.jl:5-17).  In this build
// the device compute path is XLA-compiled extended-precision kernels; the
// HOST setup path (pack_constraints: sampled-basis Gram orthonormalization,
// free-variable QR, equilibration scans — SURVEY.md §2.4/§2.9) runs here in
// C++ double-double (~32 digits) with an mpmath fallback for precisions
// beyond dd.  No external dependencies (MPFR headers are not available in
// this image); error-free transforms use compiler-guaranteed fma.
//
// Exposed as a plain C ABI consumed via ctypes (clrs_tpu/native/__init__.py).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct dd {
  double hi, lo;
};

inline dd two_sum(double a, double b) {
  double s = a + b;
  double bb = s - a;
  double e = (a - (s - bb)) + (b - bb);
  return {s, e};
}

inline dd fast_two_sum(double a, double b) {
  double s = a + b;
  double e = b - (s - a);
  return {s, e};
}

inline dd two_prod(double a, double b) {
  double p = a * b;
  double e = std::fma(a, b, -p);
  return {p, e};
}

inline dd dd_add(dd a, dd b) {
  dd s = two_sum(a.hi, b.hi);
  dd t = two_sum(a.lo, b.lo);
  double s2 = s.lo + t.hi;
  dd r = fast_two_sum(s.hi, s2);
  double r2 = r.lo + t.lo;
  return fast_two_sum(r.hi, r2);
}

inline dd dd_neg(dd a) { return {-a.hi, -a.lo}; }
inline dd dd_sub(dd a, dd b) { return dd_add(a, dd_neg(b)); }

inline dd dd_mul(dd a, dd b) {
  dd p = two_prod(a.hi, b.hi);
  double e = p.lo + (a.hi * b.lo + a.lo * b.hi);
  return fast_two_sum(p.hi, e);
}

inline dd dd_div(dd a, dd b) {
  double q1 = a.hi / b.hi;
  dd r = dd_sub(a, dd_mul({q1, 0.0}, b));
  double q2 = r.hi / b.hi;
  r = dd_sub(r, dd_mul({q2, 0.0}, b));
  double q3 = r.hi / b.hi;
  dd q = fast_two_sum(q1, q2);
  return dd_add(q, {q3, 0.0});
}

inline dd dd_sqrt(dd a) {
  if (a.hi <= 0.0) return {0.0, 0.0};
  double x = 1.0 / std::sqrt(a.hi);
  double ax = a.hi * x;
  // one Newton refinement in dd: s = ax + (a - ax^2) * x / 2
  dd ax2 = dd_mul({ax, 0.0}, {ax, 0.0});
  dd err = dd_sub(a, ax2);
  dd corr = dd_mul(err, {x * 0.5, 0.0});
  return dd_add({ax, 0.0}, corr);
}

}  // namespace

extern "C" {

// All matrices are row-major interleaved dd: [hi0, lo0, hi1, lo1, ...].

// C = A(n x m) * B(m x p)
void dd_matmul(const double* A, const double* B, double* C, int64_t n,
               int64_t m, int64_t p) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < p; ++j) {
      dd acc{0.0, 0.0};
      for (int64_t t = 0; t < m; ++t) {
        dd a{A[2 * (i * m + t)], A[2 * (i * m + t) + 1]};
        dd b{B[2 * (t * p + j)], B[2 * (t * p + j) + 1]};
        acc = dd_add(acc, dd_mul(a, b));
      }
      C[2 * (i * p + j)] = acc.hi;
      C[2 * (i * p + j) + 1] = acc.lo;
    }
  }
}

// G = V(n x m) * V^T  (Gram of rows)
void dd_gram(const double* V, double* G, int64_t n, int64_t m) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j <= i; ++j) {
      dd acc{0.0, 0.0};
      for (int64_t t = 0; t < m; ++t) {
        dd a{V[2 * (i * m + t)], V[2 * (i * m + t) + 1]};
        dd b{V[2 * (j * m + t)], V[2 * (j * m + t) + 1]};
        acc = dd_add(acc, dd_mul(a, b));
      }
      G[2 * (i * n + j)] = acc.hi;
      G[2 * (i * n + j) + 1] = acc.lo;
      G[2 * (j * n + i)] = acc.hi;
      G[2 * (j * n + i) + 1] = acc.lo;
    }
  }
}

// in-place Cholesky of SPD G (n x n), lower factor stored in the lower
// triangle.  Returns 0 on success, 1 if a pivot was non-positive.
int dd_cholesky(double* G, int64_t n) {
  for (int64_t j = 0; j < n; ++j) {
    dd d{G[2 * (j * n + j)], G[2 * (j * n + j) + 1]};
    for (int64_t t = 0; t < j; ++t) {
      dd l{G[2 * (j * n + t)], G[2 * (j * n + t) + 1]};
      d = dd_sub(d, dd_mul(l, l));
    }
    if (d.hi <= 0.0) return 1;
    dd ljj = dd_sqrt(d);
    G[2 * (j * n + j)] = ljj.hi;
    G[2 * (j * n + j) + 1] = ljj.lo;
    for (int64_t i = j + 1; i < n; ++i) {
      dd s{G[2 * (i * n + j)], G[2 * (i * n + j) + 1]};
      for (int64_t t = 0; t < j; ++t) {
        dd a{G[2 * (i * n + t)], G[2 * (i * n + t) + 1]};
        dd b{G[2 * (j * n + t)], G[2 * (j * n + t) + 1]};
        s = dd_sub(s, dd_mul(a, b));
      }
      dd lij = dd_div(s, ljj);
      G[2 * (i * n + j)] = lij.hi;
      G[2 * (i * n + j) + 1] = lij.lo;
    }
  }
  return 0;
}

// solve L X = B in place for lower-triangular L (n x n), B (n x m)
void dd_solve_tril(const double* L, double* B, int64_t n, int64_t m,
                   int unit_diag) {
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < m; ++j) {
      dd s{B[2 * (i * m + j)], B[2 * (i * m + j) + 1]};
      for (int64_t t = 0; t < i; ++t) {
        dd l{L[2 * (i * n + t)], L[2 * (i * n + t) + 1]};
        dd x{B[2 * (t * m + j)], B[2 * (t * m + j) + 1]};
        s = dd_sub(s, dd_mul(l, x));
      }
      if (!unit_diag) {
        dd d{L[2 * (i * n + i)], L[2 * (i * n + i) + 1]};
        s = dd_div(s, d);
      }
      B[2 * (i * m + j)] = s.hi;
      B[2 * (i * m + j) + 1] = s.lo;
    }
  }
}

// Householder QR of A (n x m, n >= m): returns Q (n x m, orthonormal
// columns) and R (m x m, upper).  Modified Gram-Schmidt with
// reorthogonalization — dd precision keeps it well within setup needs.
int dd_qr(const double* A, double* Q, double* R, int64_t n, int64_t m) {
  // copy A into Q
  std::memcpy(Q, A, sizeof(double) * 2 * n * m);
  std::memset(R, 0, sizeof(double) * 2 * m * m);
  for (int64_t j = 0; j < m; ++j) {
    for (int pass = 0; pass < 2; ++pass) {
      for (int64_t i = 0; i < j; ++i) {
        // r = q_i . q_j
        dd r{0.0, 0.0};
        for (int64_t t = 0; t < n; ++t) {
          dd qi{Q[2 * (t * m + i)], Q[2 * (t * m + i) + 1]};
          dd qj{Q[2 * (t * m + j)], Q[2 * (t * m + j) + 1]};
          r = dd_add(r, dd_mul(qi, qj));
        }
        // R[i,j] += r;  q_j -= r q_i
        dd rij{R[2 * (i * m + j)], R[2 * (i * m + j) + 1]};
        rij = dd_add(rij, r);
        R[2 * (i * m + j)] = rij.hi;
        R[2 * (i * m + j) + 1] = rij.lo;
        for (int64_t t = 0; t < n; ++t) {
          dd qi{Q[2 * (t * m + i)], Q[2 * (t * m + i) + 1]};
          dd qj{Q[2 * (t * m + j)], Q[2 * (t * m + j) + 1]};
          qj = dd_sub(qj, dd_mul(r, qi));
          Q[2 * (t * m + j)] = qj.hi;
          Q[2 * (t * m + j) + 1] = qj.lo;
        }
      }
    }
    // normalize
    dd nrm2{0.0, 0.0};
    for (int64_t t = 0; t < n; ++t) {
      dd qj{Q[2 * (t * m + j)], Q[2 * (t * m + j) + 1]};
      nrm2 = dd_add(nrm2, dd_mul(qj, qj));
    }
    if (nrm2.hi <= 0.0) return 1;
    dd nrm = dd_sqrt(nrm2);
    R[2 * (j * m + j)] = nrm.hi;
    R[2 * (j * m + j) + 1] = nrm.lo;
    for (int64_t t = 0; t < n; ++t) {
      dd qj{Q[2 * (t * m + j)], Q[2 * (t * m + j) + 1]};
      qj = dd_div(qj, nrm);
      Q[2 * (t * m + j)] = qj.hi;
      Q[2 * (t * m + j) + 1] = qj.lo;
    }
  }
  return 0;
}

// evaluate a dense univariate polynomial (dd coefficients, degree deg) at
// npts points (dd), Horner in dd.  coeffs: [c0, c1, ... c_deg].
void dd_polyval(const double* coeffs, int64_t deg, const double* pts,
                double* out, int64_t npts) {
  for (int64_t i = 0; i < npts; ++i) {
    dd x{pts[2 * i], pts[2 * i + 1]};
    dd acc{coeffs[2 * deg], coeffs[2 * deg + 1]};
    for (int64_t c = deg - 1; c >= 0; --c) {
      acc = dd_mul(acc, x);
      acc = dd_add(acc, {coeffs[2 * c], coeffs[2 * c + 1]});
    }
    out[2 * i] = acc.hi;
    out[2 * i + 1] = acc.lo;
  }
}

}  // extern "C"

// Native host-side ops for the CNMGP-TPU framework.
//
// The device compute path is JAX/XLA/Pallas; these C++ kernels cover the
// *host* hot loops of the initialization pipelines, which stay on CPU by
// design (SURVEY.md §7.1 layer 7):
//
//   - semivariogram pair accumulation (O(N^2); reference
//     empirical_estimation.py:35-56 loops this in Python per window)
//   - sliding-window scatter covariance stacks (local_estimation's inner
//     Y_seg^T Y_seg per point, empirical_estimation.py:104-111)
//   - k-nearest-neighbor window search for inducing-point pre-estimation
//     (reference pre_nmgp.py:9-12 argsorts the full distance vector per
//     inducing point)
//
// Built as a plain shared library, bound via ctypes (utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Semivariogram over all pairs of one output column.
// x: (n,), y: (n,) -> lag, sv each of length n*(n-1)/2.
void semivariogram(const double* x, const double* y, int64_t n, double* lag,
                   double* sv) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double xi = x[i];
    const double yi = y[i];
    for (int64_t j = i + 1; j < n; ++j) {
      lag[k] = x[j] - xi;
      const double d = y[j] - yi;
      sv[k] = 0.5 * d * d;
      ++k;
    }
  }
}

// Semivariogram for every column of Y at once.
// Y: (n, m) row-major -> sv_all: (m, n*(n-1)/2); lag: (n*(n-1)/2,).
void semivariogram_multi(const double* x, const double* Y, int64_t n, int64_t m,
                         double* lag, double* sv_all) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = i + 1; j < n; ++j) {
      lag[k++] = x[j] - x[i];
    }
  }
  const int64_t npairs = k;
  for (int64_t c = 0; c < m; ++c) {
    double* out = sv_all + c * npairs;
    int64_t t = 0;
    for (int64_t i = 0; i < n; ++i) {
      const double yi = Y[i * m + c];
      for (int64_t j = i + 1; j < n; ++j) {
        const double d = Y[j * m + c] - yi;
        out[t++] = 0.5 * d * d;
      }
    }
  }
}

// Sliding-window scatter covariance stack.
// Y: (n, m) row-major; window w; out: (n, m, m) with
// out[p] = Y[s:e]^T Y[s:e] / (e - s - 1), s = max(0, p-w), e = min(p+w, n-1).
// Matches the reference's window convention (empirical_estimation.py:80-82).
void windowed_scatter_cov(const double* Y, int64_t n, int64_t m, int64_t w,
                          double* out) {
  std::vector<double> acc(m * m);
  for (int64_t p = 0; p < n; ++p) {
    const int64_t s = std::max<int64_t>(0, p - w);
    const int64_t e = std::min<int64_t>(p + w, n - 1);
    std::fill(acc.begin(), acc.end(), 0.0);
    for (int64_t r = s; r < e; ++r) {
      const double* row = Y + r * m;
      for (int64_t a = 0; a < m; ++a) {
        const double ra = row[a];
        for (int64_t b = a; b < m; ++b) {
          acc[a * m + b] += ra * row[b];
        }
      }
    }
    const double denom = static_cast<double>(e - s - 1 > 0 ? e - s - 1 : 1);
    double* o = out + p * m * m;
    for (int64_t a = 0; a < m; ++a) {
      for (int64_t b = a; b < m; ++b) {
        const double v = acc[a * m + b] / denom;
        o[a * m + b] = v;
        o[b * m + a] = v;
      }
    }
  }
}

// k nearest neighbors of each z in x (1-D); indices out: (nz, k).
// Partial selection instead of the reference's full argsort per point.
void knn_1d(const double* x, int64_t n, const double* z, int64_t nz, int64_t k,
            int64_t* out) {
  std::vector<int64_t> idx(n);
  std::vector<double> dist(n);
  for (int64_t q = 0; q < nz; ++q) {
    const double zq = z[q];
    std::iota(idx.begin(), idx.end(), 0);
    for (int64_t i = 0; i < n; ++i) dist[i] = std::fabs(x[i] - zq);
    const int64_t kk = std::min<int64_t>(k, n);
    std::partial_sort(idx.begin(), idx.begin() + kk, idx.end(),
                      [&](int64_t a, int64_t b) {
                        if (dist[a] != dist[b]) return dist[a] < dist[b];
                        return a < b;  // stable tie-break like np.argsort
                      });
    for (int64_t i = 0; i < kk; ++i) out[q * k + i] = idx[i];
    for (int64_t i = kk; i < k; ++i) out[q * k + i] = idx[kk - 1];
  }
}

}  // extern "C"

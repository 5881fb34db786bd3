// libmr: Weibull extreme-value meta-recognition, C++ re-implementation.
//
// Native replacement for the reference's vendored libMR
// (experiments/openmax/libMR/{MetaRecognition.cpp,weibull.c}): FitHigh
// tail fitting + W_score CDF rejection probability, as consumed by the
// OpenMax baseline (AFSD/thumos14/test_openmax.py:331-354,
// openmax.py:62-65). Semantics preserved:
//   FitHigh: sort descending, take top fit_size, translate by
//            (+translate_amount - smallest_kept), MLE-fit a 2-parameter
//            Weibull -> (scale, shape).
//   W_score(x) = weibull_cdf(x*sign + translate_amount - small_score)
//              = 1 - exp(-(t/scale)^shape).
//
// The MLE solves the standard profile-likelihood shape equation
//   g(k) = sum(x^k ln x)/sum(x^k) - 1/k - mean(ln x) = 0
// by safeguarded Newton iteration, then scale = mean(x^k)^(1/k).
//
// Exposed as a C ABI for ctypes binding (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <vector>

extern "C" {

// 1 on success, <0 on error (matching the reference's weibull_fit
// convention of rval != 1 => invalid).
int mr_weibull_fit(const double* data, int n, double* out_scale,
                   double* out_shape) {
  if (n < 2) return -1;
  // all moments are computed in log space: the FitHigh translation puts
  // data near translate_amount (1e4), where x^k overflows for the large
  // shape values such tight tails imply
  std::vector<double> logs(n);
  double sum_ln = 0.0, lmax = -1e300;
  for (int i = 0; i < n; ++i) {
    if (!(data[i] > 0.0)) return -2;  // all data must be positive
    logs[i] = std::log(data[i]);
    sum_ln += logs[i];
    lmax = std::max(lmax, logs[i]);
  }
  const double mean_ln = sum_ln / n;

  // g(k) = E_w[ln x] - 1/k - mean(ln x), weights w_i = x_i^k (shifted)
  double s0 = 0.0;
  auto eval = [&](double k, double* g, double* gp) {
    s0 = 0.0;
    double s1 = 0.0, s2 = 0.0;
    for (double l : logs) {
      const double w = std::exp(k * (l - lmax));
      s0 += w;
      s1 += w * l;
      s2 += w * l * l;
    }
    const double m1 = s1 / s0;
    const double m2 = s2 / s0;
    *g = m1 - 1.0 / k - mean_ln;
    *gp = (m2 - m1 * m1) + 1.0 / (k * k);
  };

  // initial guess from the method of moments on ln x
  double var_ln = 0.0;
  for (double l : logs) {
    const double d = l - mean_ln;
    var_ln += d * d;
  }
  var_ln /= (n > 1 ? n - 1 : 1);
  double k = var_ln > 1e-300 ? 1.2 / std::sqrt(var_ln) : 1.0;
  if (!(k > 1e-6) || !std::isfinite(k)) k = 1.0;

  double g, gp;
  bool converged = false;
  for (int it = 0; it < 500; ++it) {
    eval(k, &g, &gp);
    if (!std::isfinite(g) || !std::isfinite(gp)) return -3;
    double step = g / gp;
    double k_new = k - step;
    while (k_new <= 1e-8) {  // safeguard: keep k positive
      step *= 0.5;
      k_new = k - step;
    }
    k = k_new;
    if (std::fabs(step) < 1e-12 * std::max(1.0, k)) {
      converged = true;
      break;
    }
  }
  if (!converged) {
    eval(k, &g, &gp);
    if (std::fabs(g) > 1e-5) return -4;
  }

  eval(k, &g, &gp);  // refresh s0 at the final k
  const double log_scale = lmax + std::log(s0 / n) / k;
  const double scale = std::exp(log_scale);
  if (!std::isfinite(scale) || !std::isfinite(k)) return -5;
  *out_scale = scale;
  *out_shape = k;
  return 1;
}

double mr_weibull_cdf(double x, double scale, double shape) {
  if (scale <= 0.0) return -1.0;
  if (shape <= 0.0) return -2.0;
  if (x <= 0.0) return 0.0;
  return 1.0 - std::exp(-std::pow(x / scale, shape));
}

double mr_weibull_inv(double p, double scale, double shape) {
  if (scale <= 0.0) return -1.0;
  if (shape <= 0.0) return -2.0;
  if (p < 0.0) return -3.0;
  if (p > 1.0) return -4.0;
  return scale * std::pow(-std::log(1.0 - p), 1.0 / shape);
}

// FitHigh: fit the Weibull tail of the largest `fit_size` values
// (MetaRecognition.cpp:235-241, 176-225). Returns 1 on success.
int mr_fit_high(const double* data, int n, int fit_size,
                double translate_amount, double* out_scale,
                double* out_shape, double* out_small_score) {
  if (fit_size <= 1 || fit_size > n) return -1;
  std::vector<double> sorted(data, data + n);
  std::sort(sorted.begin(), sorted.end(), std::greater<double>());
  const double small_score = sorted[fit_size - 1];
  std::vector<double> tail(fit_size);
  for (int i = 0; i < fit_size; ++i)
    tail[i] = sorted[i] + translate_amount - small_score;
  *out_small_score = small_score;
  return mr_weibull_fit(tail.data(), fit_size, out_scale, out_shape);
}

// W_score: rejection probability of x under the fitted tail
// (MetaRecognition.cpp:141-152).
double mr_w_score(double x, double scale, double shape,
                  double translate_amount, double small_score, int sign) {
  const double translated = x * sign + translate_amount - small_score;
  return mr_weibull_cdf(translated, scale, shape);
}

void mr_w_score_vector(const double* xs, int n, double scale, double shape,
                       double translate_amount, double small_score,
                       int sign, double* out) {
  for (int i = 0; i < n; ++i)
    out[i] = mr_w_score(xs[i], scale, shape, translate_amount, small_score,
                        sign);
}

}  // extern "C"

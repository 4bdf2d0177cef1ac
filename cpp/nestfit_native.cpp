// nestfit_native: sequential CPU engine for cross-validation and
// baseline measurement.
//
// Plays the role of the reference's native layer -- the Cython model
// kernels (reference: nestfit/models/*.pyx) and the external MultiNest
// Fortran sampler (reference: nestfit/core/cmultinest.pxd) -- as a
// single from-scratch C++ library:
//
//  * hyperfine / Gaussian spectrum synthesis + chi-square (dense,
//    float64; same physics as the JAX kernels, independent code path)
//  * a classical *sequential* nested sampler (one run at a time,
//    bounding-ellipsoid rejection with slice fallback) used to
//    (a) validate the vectorized TPU sampler's evidences against a
//    conventional implementation, and (b) measure an honest CPU
//    fits/sec baseline for the benchmark's vs_baseline field.
//
// Spectroscopic tables are passed in from Python; this file holds no
// line data.  Priors are per-dimension tabulated PPFs (linear
// interpolation on a uniform quantile grid), matching the reference's
// `Prior`/`Distribution` semantics (core/core.pyx:47-63,169-197).

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// model evaluators
// ---------------------------------------------------------------------------

// Hyperfine opacity + radiative transfer for one velocity component
// added into pred[n] (optically thin slabs; physics per reference
// hyperfine.pyx:52-118, exact branch).
void nf_hf_predict_comp(
    const double* xarr, const double* t0, const double* tbg, int n_chan,
    double nu, int nhf, const double* hf_voff, const double* hf_wts,
    double voff, double tex, double tau_main, double sigm,
    double* tau_scratch, double* pred)
{
    const double CKMS = 299792.458;
    for (int i = 0; i < n_chan; ++i) tau_scratch[i] = 0.0;
    for (int j = 0; j < nhf; ++j) {
        const double hf_freq = (1.0 - hf_voff[j] / CKMS) * nu;
        const double hf_width = sigm / CKMS * hf_freq;
        const double hf_nucen = hf_freq - voff / CKMS * hf_freq;
        const double hf_tau = tau_main * hf_wts[j];
        const double idenom = 0.5 / (hf_width * hf_width);
        for (int i = 0; i < n_chan; ++i) {
            const double d = xarr[i] - hf_nucen;
            tau_scratch[i] += hf_tau * std::exp(-d * d * idenom);
        }
    }
    for (int i = 0; i < n_chan; ++i) {
        const double iemtex = 1.0 / std::expm1(t0[i] / tex);
        pred[i] += t0[i] * (iemtex - tbg[i]) * (1.0 - std::exp(-tau_scratch[i]));
    }
}

// Ammonia main-line optical depth (reference ammonia.pyx:289-360).
double nf_amm_tau_main(
    double trot, double tex, double ntot, double sigm, double orth,
    int para, int level_n, double brot, double crot, double nu, double ea)
{
    const double H = 6.62607015e-27, KB = 1.380649e-16;
    const double CKMS = 299792.458, CCMS = 29979245800.0;
    const double PI = 3.14159265358979323846;
    auto zlev = [&](int j) {
        return (2.0 * j + 1.0) * std::exp(
            -H * (brot * j * (j + 1.0) + (crot - brot) * (double)j * j)
            / (KB * trot));
    };
    double qtot = 0.0;
    for (int j = 0; j < 51; ++j) {
        if (para && j % 3 != 0) qtot += zlev(j);
        if (!para && j % 3 == 0) qtot += 2.0 * zlev(j);
    }
    const double frac = para ? (1.0 - orth) : orth;
    const double pop = std::pow(10.0, ntot) * frac * zlev(level_n) / qtot;
    const double e = std::exp(-H * nu / (KB * tex));
    const double expterm = (1.0 - e) / (1.0 + e);
    const double fracterm = CCMS * CCMS * ea / (8.0 * PI * nu * nu);
    const double widthterm = CKMS / (sigm * nu * std::sqrt(2.0 * PI));
    return pop * fracterm * expterm * widthterm;
}

double nf_chi2(const double* data, const double* pred, int n)
{
    double s = 0.0;
    for (int i = 0; i < n; ++i) {
        const double d = data[i] - pred[i];
        s += d * d;
    }
    return s;
}

// ---------------------------------------------------------------------------
// sequential nested sampler
// ---------------------------------------------------------------------------

// Spectral dataset for the built-in likelihood: a set of transitions,
// each with channel arrays and hyperfine tables.
struct NfSpectrum {
    const double* xarr;
    const double* t0;
    const double* tbg;
    const double* data;
    int n_chan;
    double nu;
    int nhf;
    const double* hf_voff;
    const double* hf_wts;
    double noise;
    // ammonia tau parameters (ignored for direct-tau models)
    int para;
    int level_n;
    double ea;
};

struct NfProblem {
    int kind;            // 0: analytic gaussian, 1: ammonia, 2: gaussian-mix
    int ndim;
    int ncomp;
    // priors: per-dim PPF tables [ndim, ppf_n]
    const double* ppf;
    int ppf_n;
    // joint resolved-placement prior on the centroid dims (reference
    // core.pyx:369-434; mirrors nestfit_tpu.priors.ResolvedPlacementPrior):
    // when plc_n > 0 and ncomp >= 2, the voff dims [plc_p_voff*C + i]
    // are drawn sequentially over the tabulated vcen distribution with
    // minimum separations  sep_scale * sqrt(sig_i * sig_{i-1})  taken
    // from the (independently transformed) sigm dims.  The per-dim PPF
    // tables for the voff dims are ignored in that case -- independent
    // tables cannot represent the joint coupling, which is exactly the
    // marginalization error this path removes from the CPU baseline.
    int plc_p_voff = -1;
    int plc_p_sigm = -1;
    double plc_sep_scale = 0.0;
    const double* plc_xax = nullptr;   // [plc_n] uniform grid
    const double* plc_pdf = nullptr;   // [plc_n]
    int plc_n = 0;
    double plc_dx = 0.0, plc_xmin = 0.0, plc_xmax = 0.0;
    // spectra
    std::vector<NfSpectrum> spectra;
    // analytic gaussian
    double asigma;
    // ammonia constants
    double brot, crot;
    // scratch
    mutable std::vector<double> tau_scratch, pred_scratch, theta_scratch;
    mutable std::vector<double> plc_cdf_scratch;
};

// Invert the tapered interval CDF at u over [lo_in, hi_in] -- the f64
// scalar analogue of nestfit_tpu.priors.distributions.cdf_over_interval
// + cdf_interp (reference Distribution.cdf_over_interval,
// core.pyx:109-161): trapezoid accumulation of the PDF with a reverse
// power-law taper ((i_hi - i) / span)^sfact, renormalized over the
// interval, then linear inverse interpolation.
static double nf_tapered_invert(const NfProblem& P, double u,
                                double lo_in, double hi_in, int sfact)
{
    const int n = P.plc_n;
    const double lo = std::min(lo_in, hi_in);
    const double hi = std::max(lo_in, hi_in);
    int i_lo = (int)((lo - P.plc_xmin) / P.plc_dx);
    if (i_lo < 0) i_lo = 0;
    if (i_lo > n - 1) i_lo = n - 1;
    int i_hi = (int)((hi - P.plc_xmin) / P.plc_dx);
    if (i_hi == i_lo) i_hi = i_lo + 1;
    if (i_hi < 1) i_hi = 1;
    if (i_hi > n) i_hi = n;
    const int span = std::max(i_hi - i_lo, 1);
    double* cdf = P.plc_cdf_scratch.data();
    // degenerate single-cell interval: delta at i_lo (core.pyx:140-141)
    if (i_hi - i_lo == 1) {
        for (int j = 0; j < n; ++j) cdf[j] = (j >= i_lo) ? 1.0 : 0.0;
    } else {
        double csum = 0.0;
        for (int j = 0; j < n; ++j) {
            if (j > i_lo && j < i_hi) {
                const double t = (double)(j - i_lo) / (double)span;
                const double taper =
                    std::pow(std::max(1.0 - t, 0.0), (double)sfact);
                csum += 0.5 * (P.plc_pdf[j] + P.plc_pdf[j - 1]) * taper;
            }
            cdf[j] = csum;
        }
        const double total = std::max(csum, 1e-30);
        for (int j = 0; j < n; ++j) {
            if (j < i_lo) cdf[j] = 0.0;
            else if (j >= i_hi) cdf[j] = 1.0;
            else cdf[j] /= total;
        }
    }
    // inverse interpolation (core.pyx:65-107 semantics)
    u = std::max(u, 1e-30);
    int i_s = 0;
    while (i_s < n && cdf[i_s] < u) ++i_s;
    if (i_s < 1) i_s = 1;
    if (i_s > n - 1) i_s = n - 1;
    const double y_lo = cdf[i_s - 1];
    const double y_hi = cdf[i_s];
    const double denom = std::max(y_hi - y_lo, 1e-30);
    return P.plc_xax[i_s - 1] + (u - y_lo) * (P.plc_dx / denom);
}

// Sequential resolved placement of the ncomp centroids (reference
// core.pyx:392-434): left-to-right draws over the remaining interval,
// adjacent components kept >= sep_scale * sqrt(sig_i * sig_{i-1})
// apart, separations shrunk to fit when their sum exceeds the range.
static void nf_placement_overwrite(const NfProblem& P, const double* u,
                                   double* theta)
{
    const int C = P.ncomp;
    double min_sep[16];
    double sep_tot = 0.0;
    min_sep[0] = 0.0;
    for (int i = 1; i < C; ++i) {
        const double si = theta[(size_t)P.plc_p_sigm * C + i];
        const double sp = theta[(size_t)P.plc_p_sigm * C + i - 1];
        min_sep[i] = P.plc_sep_scale * std::sqrt(si * sp);
        sep_tot += min_sep[i];
    }
    const double v_range = P.plc_xmax - P.plc_xmin;
    if (sep_tot > v_range) {
        const double f = v_range / sep_tot;
        for (int i = 0; i < C; ++i) min_sep[i] *= f;
        sep_tot *= f;
    }
    double v_lo = P.plc_xmin;
    double v_hi = P.plc_xmax - sep_tot;
    for (int i = 0; i < C; ++i) {
        v_lo += min_sep[i];
        v_hi += min_sep[i];
        const int sfact = C - 1 - i;
        const double v = nf_tapered_invert(
            P, u[(size_t)P.plc_p_voff * C + i], v_lo, v_hi, sfact);
        theta[(size_t)P.plc_p_voff * C + i] = v;
        v_lo = v;
    }
}

static void transform_theta(const NfProblem& P, const double* u, double* theta)
{
    // independent per-dimension PPF interpolation (core.pyx:47-63)
    for (int d = 0; d < P.ndim; ++d) {
        const double* tab = P.ppf + (size_t)d * P.ppf_n;
        double x = u[d] * (P.ppf_n - 1);
        int i = (int)x;
        if (i > P.ppf_n - 2) i = P.ppf_n - 2;
        if (i < 0) i = 0;
        const double f = x - i;
        theta[d] = tab[i] + (tab[i + 1] - tab[i]) * f;
    }
    if (P.plc_n > 0 && P.ncomp >= 2)
        nf_placement_overwrite(P, u, theta);
}

static double loglike(const NfProblem& P, const double* u, long* ncall)
{
    ++(*ncall);
    if (P.kind == 0) {
        double s = 0.0;
        for (int d = 0; d < P.ndim; ++d) {
            const double dd = u[d] - 0.5;
            s += dd * dd;
        }
        return -0.5 * s / (P.asigma * P.asigma);
    }
    double* theta = P.theta_scratch.data();
    transform_theta(P, u, theta);
    const int C = P.ncomp;
    double lnl = 0.0;
    for (const auto& sp : P.spectra) {
        double* pred = P.pred_scratch.data();
        std::fill(pred, pred + sp.n_chan, 0.0);
        for (int c = 0; c < C; ++c) {
            if (P.kind == 1) {
                // params strided parameter-major [p*C + c]
                const double voff = theta[0 * C + c];
                const double trot = theta[1 * C + c];
                const double tex = theta[2 * C + c];
                const double ntot = theta[3 * C + c];
                const double sigm = theta[4 * C + c];
                const double orth = theta[5 * C + c];
                const double tm = nf_amm_tau_main(
                    trot, tex, ntot, sigm, orth, sp.para, sp.level_n,
                    P.brot, P.crot, sp.nu, sp.ea);
                nf_hf_predict_comp(
                    sp.xarr, sp.t0, sp.tbg, sp.n_chan, sp.nu, sp.nhf,
                    sp.hf_voff, sp.hf_wts, voff, tex, tm, sigm,
                    P.tau_scratch.data(), pred);
            } else {
                // gaussian mixture: voff, sigm, peak
                const double CKMS = 299792.458;
                const double voff = theta[0 * C + c];
                const double sigm = theta[1 * C + c];
                const double peak = theta[2 * C + c];
                const double w = sigm / CKMS * sp.nu;
                const double cen = sp.nu * (1.0 - voff / CKMS);
                const double idenom = 0.5 / (w * w);
                for (int i = 0; i < sp.n_chan; ++i) {
                    const double d = sp.xarr[i] - cen;
                    pred[i] += peak * std::exp(-d * d * idenom);
                }
            }
        }
        lnl += -nf_chi2(sp.data, pred, sp.n_chan)
               / (2.0 * sp.noise * sp.noise);
    }
    return lnl;
}

// Cholesky of a small SPD matrix (in-place lower factor).
static bool cholesky(std::vector<double>& a, int n)
{
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = a[(size_t)i * n + j];
            for (int k = 0; k < j; ++k)
                s -= a[(size_t)i * n + k] * a[(size_t)j * n + k];
            if (i == j) {
                if (s <= 0.0) return false;
                a[(size_t)i * n + i] = std::sqrt(s);
            } else {
                a[(size_t)i * n + j] = s / a[(size_t)j * n + j];
            }
        }
        for (int j = i + 1; j < n; ++j) a[(size_t)i * n + j] = 0.0;
    }
    return true;
}

struct NsOut {
    double lnz;
    double lnz_err;
    double h;
    long n_dead;
    long ncall;
    double max_loglike;
    bool truncated;   // hit max_iter or the wall-clock box before tol
};

static double logaddexp(double a, double b)
{
    if (a < b) std::swap(a, b);
    if (b == -INFINITY) return a;
    return a + std::log1p(std::exp(b - a));
}

// Classical sequential nested sampling with single-ellipsoid rejection
// and whitened slice fallback -- the algorithmic role of MultiNest
// `run` (reference core/cmultinest.pxd:4-33) for one problem.
static NsOut ns_run(const NfProblem& P, int nlive, double tol,
                    long max_iter, uint64_t seed,
                    double* bestfit /*ndim, may be null*/,
                    double max_wall_s = 0.0 /*<=0: unbounded*/)
{
    const int D = P.ndim;
    const auto t_start = std::chrono::steady_clock::now();
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> U(0.0, 1.0);
    std::normal_distribution<double> N(0.0, 1.0);

    std::vector<double> live((size_t)nlive * D), lnl(nlive);
    long ncall = 0;
    for (int k = 0; k < nlive; ++k) {
        for (int d = 0; d < D; ++d) live[(size_t)k * D + d] = U(rng);
        lnl[k] = loglike(P, &live[(size_t)k * D], &ncall);
    }
    double lnz = -INFINITY, h = 0.0;
    double max_lnl_seen = -INFINITY;
    std::vector<double> mean(D), cov((size_t)D * D), chol_((size_t)D * D);
    std::vector<double> prop(D), zvec(D), start(D);
    const double inv_l = 1.0 / nlive;
    const double ln_comp = std::log1p(-std::exp(-inv_l));
    long it = 0;
    bool converged = false;
    for (; it < max_iter; ++it) {
        int worst = 0;
        for (int k = 1; k < nlive; ++k) if (lnl[k] < lnl[worst]) worst = k;
        const double lnl_star = lnl[worst];
        const double lnw = -(double)it * inv_l + ln_comp;
        const double lnzw = lnw + lnl_star;
        const double lnz_new = logaddexp(lnz, lnzw);
        if (std::isfinite(lnzw)) {
            const double a = std::exp(lnzw - lnz_new);
            const double b = std::exp(lnz - lnz_new);
            h = a * lnl_star + b * (h + lnz) - lnz_new;
            if (!std::isfinite(h)) h = 0.0;
        }
        lnz = lnz_new;
        if (lnl_star > max_lnl_seen) max_lnl_seen = lnl_star;

        // live mean/cov + Cholesky + max Mahalanobis radius
        std::fill(mean.begin(), mean.end(), 0.0);
        for (int k = 0; k < nlive; ++k)
            for (int d = 0; d < D; ++d) mean[d] += live[(size_t)k * D + d];
        for (int d = 0; d < D; ++d) mean[d] *= inv_l;
        std::fill(cov.begin(), cov.end(), 0.0);
        for (int k = 0; k < nlive; ++k)
            for (int a2 = 0; a2 < D; ++a2)
                for (int b2 = 0; b2 <= a2; ++b2)
                    cov[(size_t)a2 * D + b2] +=
                        (live[(size_t)k * D + a2] - mean[a2]) *
                        (live[(size_t)k * D + b2] - mean[b2]);
        for (int a2 = 0; a2 < D; ++a2)
            for (int b2 = 0; b2 <= a2; ++b2) {
                cov[(size_t)a2 * D + b2] =
                    cov[(size_t)a2 * D + b2] * inv_l +
                    (a2 == b2 ? 1e-10 : 0.0);
                cov[(size_t)b2 * D + a2] = cov[(size_t)a2 * D + b2];
            }
        chol_ = cov;
        const bool ok_chol = cholesky(chol_, D);
        double rmax = 0.0;
        if (ok_chol) {
            for (int k = 0; k < nlive; ++k) {
                // solve L z = (x - mean)
                double r2 = 0.0;
                for (int a2 = 0; a2 < D; ++a2) {
                    double s = live[(size_t)k * D + a2] - mean[a2];
                    for (int b2 = 0; b2 < a2; ++b2)
                        s -= chol_[(size_t)a2 * D + b2] * zvec[b2];
                    zvec[a2] = s / chol_[(size_t)a2 * D + a2];
                    r2 += zvec[a2] * zvec[a2];
                }
                if (r2 > rmax) rmax = r2;
            }
            rmax = std::sqrt(rmax) * 1.1;
        }

        // replacement: ellipsoid rejection, then slice fallback
        bool accepted = false;
        double new_lnl = 0.0;
        if (ok_chol) {
            for (int t = 0; t < 64 && !accepted; ++t) {
                double norm = 0.0;
                for (int d = 0; d < D; ++d) { zvec[d] = N(rng); norm += zvec[d] * zvec[d]; }
                norm = std::sqrt(norm);
                const double r = std::pow(U(rng), 1.0 / D) * rmax / norm;
                bool inb = true;
                for (int a2 = 0; a2 < D; ++a2) {
                    double s = 0.0;
                    for (int b2 = 0; b2 <= a2; ++b2)
                        s += chol_[(size_t)a2 * D + b2] * zvec[b2];
                    prop[a2] = mean[a2] + r * s;
                    if (prop[a2] < 0.0 || prop[a2] > 1.0) inb = false;
                }
                if (!inb) { ++ncall; continue; }
                const double l = loglike(P, prop.data(), &ncall);
                if (l > lnl_star) { accepted = true; new_lnl = l; }
            }
        }
        if (!accepted) {
            // whitened slice sampling from a random live point
            int s0 = (int)(U(rng) * nlive) % nlive;
            if (s0 == worst) s0 = (s0 + 1) % nlive;
            std::copy(&live[(size_t)s0 * D], &live[(size_t)s0 * D] + D,
                      start.begin());
            double cur_lnl = lnl[s0];
            for (int rep = 0; rep < 2 * D; ++rep) {
                for (int d = 0; d < D; ++d) zvec[d] = N(rng);
                std::vector<double> dir(D, 0.0);
                for (int a2 = 0; a2 < D; ++a2)
                    for (int b2 = 0; b2 <= a2; ++b2)
                        dir[a2] += (ok_chol ? chol_[(size_t)a2 * D + b2]
                                            : (a2 == b2 ? 0.1 : 0.0)) * zvec[b2];
                double t_lo = -2.0 * U(rng);
                double t_hi = t_lo + 2.0;
                for (int c2 = 0; c2 < 16; ++c2) {
                    const double t = t_lo + (t_hi - t_lo) * U(rng);
                    bool inb = true;
                    for (int d = 0; d < D; ++d) {
                        prop[d] = start[d] + t * dir[d];
                        if (prop[d] < 0.0 || prop[d] > 1.0) inb = false;
                    }
                    double l = -INFINITY;
                    if (inb) l = loglike(P, prop.data(), &ncall);
                    else ++ncall;
                    if (l > lnl_star) {
                        std::copy(prop.begin(), prop.end(), start.begin());
                        cur_lnl = l;
                        break;
                    }
                    if (t < 0) t_lo = t; else t_hi = t;
                }
            }
            accepted = true;
            new_lnl = cur_lnl;
            std::copy(start.begin(), start.end(), prop.begin());
        }
        std::copy(prop.begin(), prop.end(), &live[(size_t)worst * D]);
        lnl[worst] = new_lnl;

        // termination
        double lnl_max = lnl[0];
        for (int k = 1; k < nlive; ++k) if (lnl[k] > lnl_max) lnl_max = lnl[k];
        const double lnx = -(double)(it + 1) * inv_l;
        if (logaddexp(lnz, lnx + lnl_max) - lnz < tol) {
            ++it;
            converged = true;
            break;
        }
        // wall-clock box (checked coarsely; keeps a caller's overall
        // budget deterministic even when a single run stalls)
        if (max_wall_s > 0.0 && (it & 63) == 0) {
            const std::chrono::duration<double> dt =
                std::chrono::steady_clock::now() - t_start;
            if (dt.count() > max_wall_s) { ++it; break; }
        }
    }
    // add live points
    const double lnx = -(double)it * inv_l;
    int best_k = 0;
    for (int k = 0; k < nlive; ++k) {
        const double lnzw = lnx - std::log((double)nlive) + lnl[k];
        const double lnz_new = logaddexp(lnz, lnzw);
        const double a = std::exp(lnzw - lnz_new);
        const double b = std::exp(lnz - lnz_new);
        h = a * lnl[k] + b * (h + lnz) - lnz_new;
        lnz = lnz_new;
        if (lnl[k] > max_lnl_seen) max_lnl_seen = lnl[k];
        if (lnl[k] > lnl[best_k]) best_k = k;
    }
    if (bestfit) {
        std::vector<double> th(D);
        if (P.kind == 0)
            std::copy(&live[(size_t)best_k * D], &live[(size_t)best_k * D] + D,
                      th.begin());
        else
            transform_theta(P, &live[(size_t)best_k * D], th.data());
        std::copy(th.begin(), th.end(), bestfit);
    }
    NsOut out;
    out.lnz = lnz;
    out.h = std::max(h, 0.0);
    out.lnz_err = std::sqrt(out.h * inv_l);
    out.n_dead = it;
    out.ncall = ncall;
    out.max_loglike = max_lnl_seen;
    out.truncated = !converged;
    return out;
}

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

// Analytic isotropic-Gaussian problem (validation).
void nf_ns_gaussian(int ndim, double sigma, int nlive, double tol,
                    long max_iter, uint64_t seed, double* out6)
{
    NfProblem P;
    P.kind = 0;
    P.ndim = ndim;
    P.ncomp = 1;
    P.ppf = nullptr;
    P.ppf_n = 0;
    P.asigma = sigma;
    NsOut o = ns_run(P, nlive, tol, max_iter, seed, nullptr);
    out6[0] = o.lnz; out6[1] = o.lnz_err; out6[2] = o.h;
    out6[3] = (double)o.n_dead; out6[4] = (double)o.ncall;
    out6[5] = o.max_loglike;
}

// Spectral-model nested sampling run.
//   kind: 1 ammonia, 2 gaussian mixture
//   per transition arrays are concatenated with offsets.
void nf_ns_spectral(
    int kind, int ncomp, int n_params,
    const double* ppf, int ppf_n,
    int plc_p_voff, int plc_p_sigm, double plc_sep_scale,
    const double* plc_xax, const double* plc_pdf, int plc_n,
    int n_spec,
    const double* xarr_cat, const double* t0_cat, const double* tbg_cat,
    const double* data_cat, const int* n_chan, const double* nu,
    const int* nhf, const double* hf_voff_cat, const double* hf_wts_cat,
    const double* noise, const int* para, const int* level_n,
    const double* ea, double brot, double crot,
    int nlive, double tol, long max_iter, uint64_t seed,
    double max_wall_s,
    double* out7, double* bestfit)
{
    NfProblem P;
    P.kind = kind;
    P.ncomp = ncomp;
    P.ndim = n_params * ncomp;
    P.ppf = ppf;
    P.ppf_n = ppf_n;
    if (plc_n > 0 && plc_p_voff >= 0 && plc_p_sigm >= 0 && ncomp <= 16) {
        P.plc_p_voff = plc_p_voff;
        P.plc_p_sigm = plc_p_sigm;
        P.plc_sep_scale = plc_sep_scale;
        P.plc_xax = plc_xax;
        P.plc_pdf = plc_pdf;
        P.plc_n = plc_n;
        P.plc_xmin = plc_xax[0];
        P.plc_xmax = plc_xax[plc_n - 1];
        P.plc_dx = (P.plc_xmax - P.plc_xmin) / (double)(plc_n - 1);
        P.plc_cdf_scratch.resize(plc_n);
    }
    P.brot = brot;
    P.crot = crot;
    int max_chan = 0;
    long ch_off = 0, hf_off = 0;
    for (int s = 0; s < n_spec; ++s) {
        NfSpectrum sp;
        sp.xarr = xarr_cat + ch_off;
        sp.t0 = t0_cat + ch_off;
        sp.tbg = tbg_cat + ch_off;
        sp.data = data_cat + ch_off;
        sp.n_chan = n_chan[s];
        sp.nu = nu[s];
        sp.nhf = nhf[s];
        sp.hf_voff = hf_voff_cat + hf_off;
        sp.hf_wts = hf_wts_cat + hf_off;
        sp.noise = noise[s];
        sp.para = para ? para[s] : 0;
        sp.level_n = level_n ? level_n[s] : 0;
        sp.ea = ea ? ea[s] : 0.0;
        P.spectra.push_back(sp);
        ch_off += n_chan[s];
        hf_off += nhf[s];
        if (n_chan[s] > max_chan) max_chan = n_chan[s];
    }
    P.tau_scratch.resize(max_chan);
    P.pred_scratch.resize(max_chan);
    P.theta_scratch.resize(P.ndim);
    NsOut o = ns_run(P, nlive, tol, max_iter, seed, bestfit, max_wall_s);
    out7[0] = o.lnz; out7[1] = o.lnz_err; out7[2] = o.h;
    out7[3] = (double)o.n_dead; out7[4] = (double)o.ncall;
    out7[5] = o.max_loglike; out7[6] = o.truncated ? 1.0 : 0.0;
}

// Direct prior transform (for parity tests): per-dim PPF tables plus
// the optional joint resolved-placement overwrite, same code path the
// sampler uses.
void nf_transform(
    int ncomp, int n_params,
    const double* ppf, int ppf_n,
    int plc_p_voff, int plc_p_sigm, double plc_sep_scale,
    const double* plc_xax, const double* plc_pdf, int plc_n,
    const double* u, int n_pts, double* theta)
{
    NfProblem P;
    P.kind = 1;
    P.ncomp = ncomp;
    P.ndim = n_params * ncomp;
    P.ppf = ppf;
    P.ppf_n = ppf_n;
    if (plc_n > 0 && plc_p_voff >= 0 && plc_p_sigm >= 0 && ncomp <= 16) {
        P.plc_p_voff = plc_p_voff;
        P.plc_p_sigm = plc_p_sigm;
        P.plc_sep_scale = plc_sep_scale;
        P.plc_xax = plc_xax;
        P.plc_pdf = plc_pdf;
        P.plc_n = plc_n;
        P.plc_xmin = plc_xax[0];
        P.plc_xmax = plc_xax[plc_n - 1];
        P.plc_dx = (P.plc_xmax - P.plc_xmin) / (double)(plc_n - 1);
        P.plc_cdf_scratch.resize(plc_n);
    }
    for (int k = 0; k < n_pts; ++k)
        transform_theta(P, u + (size_t)k * P.ndim,
                        theta + (size_t)k * P.ndim);
}

// Direct model evaluation (for kernel cross-validation): ammonia.
void nf_amm_predict(
    const double* xarr, const double* t0, const double* tbg, int n_chan,
    double nu, int nhf, const double* hf_voff, const double* hf_wts,
    int para, int level_n, double ea, double brot, double crot,
    const double* params, int ncomp, double* pred)
{
    std::vector<double> tau(n_chan);
    std::fill(pred, pred + n_chan, 0.0);
    for (int c = 0; c < ncomp; ++c) {
        const double voff = params[0 * ncomp + c];
        const double trot = params[1 * ncomp + c];
        const double tex = params[2 * ncomp + c];
        const double ntot = params[3 * ncomp + c];
        const double sigm = params[4 * ncomp + c];
        const double orth = params[5 * ncomp + c];
        const double tm = nf_amm_tau_main(trot, tex, ntot, sigm, orth,
                                          para, level_n, brot, crot, nu, ea);
        nf_hf_predict_comp(xarr, t0, tbg, n_chan, nu, nhf, hf_voff, hf_wts,
                           voff, tex, tm, sigm, tau.data(), pred);
    }
}

}  // extern "C"

"""EVSAC: correctness-probability weighted sampling from extreme-value
statistics of descriptor match distances.

ref: src/theia/solvers/evsac_sampler.h:66-106 (+ vendored statx), after
"EVSAC: Accelerating Hypotheses Generation by Modeling Matching Scores
using Extreme Value Theory" (Fragoso et al., ICCV 2013). The pipeline,
faithfully reproduced in JAX:

  1. MR-Rayleigh predictor (evsac_sampler.h MRRayleigh): per query, fit
     a Rayleigh to the tail of its k-NN distances; predict "correct"
     when 1 - raylcdf(d_1) >= predictor_threshold (recommended 0.65).
  2. Fit a Gamma(k, theta) by MLE to the smallest distances of the
     predicted-correct queries (statx gammafit).
  3. Fit a GEV(mu, sigma, xi) to the NEGATED second-smallest distances
     (reversed GEV models the incorrect-match distances; statx gevfit
     MLE). Here: L-moment (Hosking) closed-form init + guarded Newton
     steps on the negative log-likelihood — MLE in JAX.
  4. Estimate the inlier ratio eps by the constrained least squares
     fit of the mixture CDF to the empirical CDF of the smallest
     distances, bounded above by the predictor's positive rate (the
     reference solves the equivalent 2-var QP with optimo; with the
     sum-to-one equality eliminated it is a 1-D box-constrained LS
     with a closed form).
  5. Posterior P(correct | d) = eps*gamma_pdf / (eps*gamma_pdf +
     (1-eps)*gev_rev_pdf); sampling weight = posterior * predicted.
     (The reversed-GEV density is evaluated at -d, consistent with the
     CDF the reference uses in EstimateInlierRatio:412-416.)

The weights feed the engine's 'weighted' sampler (Gumbel top-k), the
batched replacement for the reference's std::discrete_distribution.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class EvsacMixtureParams(NamedTuple):
    """ref EvsacSampler::MixtureModelParams (evsac_sampler.h:139-160)."""
    gamma_k: jnp.ndarray
    gamma_theta: jnp.ndarray
    gev_mu: jnp.ndarray
    gev_sigma: jnp.ndarray
    gev_xi: jnp.ndarray
    inlier_ratio: jnp.ndarray


# ---------------------------------------------------------------- Rayleigh

def mr_rayleigh_predict(sorted_distances, predictor_threshold=0.65):
    """Meta-Recognition Rayleigh predictor (evsac_sampler.h MRRayleigh).

    sorted_distances: (N, k) ascending per-query NN distances. The tail
    (columns 1..k-1) fits sigma^2 = mean(x^2)/2 (Rayleigh MLE); the
    correctness belief is 1 - raylcdf(d_0) = exp(-d_0^2 / (2 sigma^2)).
    Returns (predicted (N,) bool, confidence (N,)).
    """
    d0 = sorted_distances[:, 0]
    tail = sorted_distances[:, 1:]
    sigma2 = jnp.maximum(jnp.mean(tail * tail, axis=1) / 2.0, 1e-20)
    confidence = jnp.exp(-(d0 * d0) / (2.0 * sigma2))
    return confidence >= predictor_threshold, confidence


# ------------------------------------------------------------------- Gamma

def fit_gamma_mle(x, weights, newton_iters: int = 5):
    """Weighted Gamma MLE (statx gammafit role): closed-form
    approximation of the shape from s = log(mean) - mean(log), refined
    with Newton on the profile likelihood; theta = mean / k."""
    w = weights
    n = jnp.maximum(jnp.sum(w), 1e-9)
    xs = jnp.maximum(x, 1e-12)
    mean = jnp.sum(w * xs) / n
    mean_log = jnp.sum(w * jnp.log(xs)) / n
    s = jnp.maximum(jnp.log(mean) - mean_log, 1e-8)
    k = (3.0 - s + jnp.sqrt((s - 3.0) ** 2 + 24.0 * s)) / (12.0 * s)

    def newton(_, k):
        f = jnp.log(k) - jax.scipy.special.digamma(k) - s
        fp = 1.0 / k - jax.scipy.special.polygamma(1, k)
        k_new = k - f / fp
        return jnp.where((k_new > 1e-6) & jnp.isfinite(k_new), k_new, k)

    k = jax.lax.fori_loop(0, newton_iters, newton, k)
    theta = mean / k
    return k, theta


def gamma_logpdf(x, k, theta):
    xs = jnp.maximum(x, 1e-12)
    return ((k - 1.0) * jnp.log(xs) - xs / theta -
            jax.scipy.special.gammaln(k) - k * jnp.log(theta))


def gamma_cdf(x, k, theta):
    return jax.scipy.special.gammainc(k, jnp.maximum(x, 0.0) / theta)


# --------------------------------------------------------------------- GEV

def gev_logpdf(x, mu, sigma, xi):
    """statx gevpdf (gev.h:50-68) in log space; zero density (-inf)
    outside the support 1 + xi*(x-mu)/sigma > 0."""
    sigma = jnp.maximum(sigma, 1e-12)
    arg = (x - mu) / sigma
    # smooth Gumbel switch at tiny xi for numerical stability
    xi_safe = jnp.where(jnp.abs(xi) < 1e-6,
                        jnp.where(xi < 0, -1e-6, 1e-6), xi)
    t = 1.0 + xi_safe * arg
    valid = t > 1e-12
    ts = jnp.maximum(t, 1e-12)
    logp = (-(1.0 / xi_safe + 1.0) * jnp.log(ts) -
            ts ** (-1.0 / xi_safe) - jnp.log(sigma))
    return jnp.where(valid, logp, -jnp.inf)


def gev_cdf(x, mu, sigma, xi):
    """statx gevcdf (gev.h:74-88)."""
    sigma = jnp.maximum(sigma, 1e-12)
    arg = (x - mu) / sigma
    xi_safe = jnp.where(jnp.abs(xi) < 1e-6,
                        jnp.where(xi < 0, -1e-6, 1e-6), xi)
    t = jnp.maximum(1.0 + xi_safe * arg, 1e-12)
    cdf = jnp.exp(-t ** (-1.0 / xi_safe))
    # outside support: 0 below a lower bound (xi>0), 1 above an upper
    # bound (xi<0)
    below = (1.0 + xi_safe * arg) <= 0
    return jnp.where(below, jnp.where(xi_safe > 0, 0.0, 1.0), cdf)


def _gev_lmoments_init(x, weights):
    """Hosking's L-moment GEV estimator (closed form): robust init for
    the MLE refinement. Weighted/masked via rank computation over the
    valid entries only (invalid entries sort to +inf)."""
    big = jnp.max(jnp.abs(x)) * 0 + 1e30
    xs = jnp.sort(jnp.where(weights > 0, x, big))
    n = jnp.maximum(jnp.sum(weights > 0), 3.0)
    j = jnp.arange(x.shape[0], dtype=x.dtype)
    valid = j < n
    xv = jnp.where(valid, xs, 0.0)
    b0 = jnp.sum(xv) / n
    b1 = jnp.sum(xv * j / jnp.maximum(n - 1.0, 1.0)) / n
    b2 = jnp.sum(xv * j * (j - 1.0) /
                 jnp.maximum((n - 1.0) * (n - 2.0), 1.0)) / n
    l1 = b0
    l2 = 2.0 * b1 - b0
    l3 = 6.0 * b2 - 6.0 * b1 + b0
    t3 = l3 / jnp.where(jnp.abs(l2) < 1e-12, 1e-12, l2)
    c = 2.0 / (3.0 + t3) - jnp.log(2.0) / jnp.log(3.0)
    k_h = 7.8590 * c + 2.9554 * c * c          # Hosking's k = -xi
    k_h = jnp.clip(k_h, -0.99, 5.0)
    g1k = jnp.exp(jax.scipy.special.gammaln(1.0 + k_h))
    sigma = l2 * k_h / ((1.0 - 2.0 ** (-k_h)) * g1k)
    mu = l1 - sigma * (1.0 - g1k) / k_h
    return mu, jnp.maximum(sigma, 1e-9), -k_h


def fit_gev_mle(x, weights, newton_iters: int = 8):
    """GEV MLE (statx gevfit role): L-moment init + guarded Newton on
    the weighted negative log-likelihood over (mu, log sigma, xi).
    Steps that leave the support or increase the NLL are rejected."""
    mu0, sigma0, xi0 = _gev_lmoments_init(x, weights)
    n = jnp.maximum(jnp.sum(weights), 1.0)

    def nll(p):
        mu, log_sigma, xi = p[0], p[1], p[2]
        lp = gev_logpdf(x, mu, jnp.exp(log_sigma), xi)
        # outside-support samples contribute a large finite penalty
        lp = jnp.where(jnp.isfinite(lp), lp, -1e4)
        return -jnp.sum(weights * lp) / n

    p0 = jnp.stack([mu0, jnp.log(sigma0), xi0])

    def newton(_, p):
        g = jax.grad(nll)(p)
        H = jax.hessian(nll)(p)
        H = H + 1e-6 * jnp.eye(3, dtype=p.dtype)
        step = jnp.linalg.solve(H, g)
        p_new = p - step
        better = (nll(p_new) < nll(p)) & jnp.all(jnp.isfinite(p_new))
        return jnp.where(better, p_new, p)

    p = jax.lax.fori_loop(0, newton_iters, newton, p0)
    return p[0], jnp.exp(p[1]), p[2]


# ----------------------------------------------------------------- mixture

@partial(jax.jit, static_argnames=())
def evsac_mixture(sorted_distances, predictor_threshold=0.65,
                  row_mask=None):
    """Full EVSAC mixture calculation
    (ref EvsacSampler::CalculateMixtureModel, evsac_sampler.h:568-626).

    sorted_distances: (N, k) ascending k-NN match distances, k >= 3.
    Returns (probabilities (N,), sampling_weights (N,),
    EvsacMixtureParams). Weights are posterior * predicted — queries
    the MR-Rayleigh predictor rejects are suppressed from sampling.
    """
    d = jnp.asarray(sorted_distances)
    N = d.shape[0]
    if row_mask is None:
        row_mask = jnp.ones((N,), bool)

    predicted, _ = mr_rayleigh_predict(d, predictor_threshold)
    predicted = predicted & row_mask
    d1 = d[:, 0]
    neg_d2 = -d[:, 1]
    w_pred = predicted.astype(d.dtype)
    w_all = row_mask.astype(d.dtype)
    inlier_ratio_ub = jnp.sum(w_pred) / jnp.maximum(jnp.sum(w_all), 1.0)

    # 2) Gamma on predicted-correct smallest distances
    gk, gtheta = fit_gamma_mle(d1, w_pred)
    # 3) reversed GEV on negated second-smallest distances
    mu, sigma, xi = fit_gev_mle(neg_d2, w_all)

    # 4) inlier ratio: min_eps || y - eps*A1 - (1-eps)*A2 ||^2 over the
    # empirical CDF of the smallest distances, eps in [0, ub]
    # (the reference's 2-var QP with x1 + x2 = 1 eliminated)
    big = 1e30
    xs = jnp.sort(jnp.where(row_mask, d1, big))
    n_valid = jnp.maximum(jnp.sum(w_all), 2.0)
    ranks = jnp.arange(N, dtype=d.dtype)
    valid = ranks < n_valid
    y = (ranks + 1.0) / n_valid
    A1 = gamma_cdf(xs, gk, gtheta)
    A2 = 1.0 - gev_cdf(-xs, mu, sigma, xi)     # reversed-GEV CDF
    num = jnp.sum(jnp.where(valid, (y - A2) * (A1 - A2), 0.0))
    den = jnp.maximum(
        jnp.sum(jnp.where(valid, (A1 - A2) ** 2, 0.0)), 1e-12)
    eps = jnp.clip(num / den, 0.0,
                   jnp.minimum(inlier_ratio_ub, 1.0))

    # 5) posterior + weights (ComputePosteriorAndWeights)
    gam_val = eps * jnp.exp(gamma_logpdf(d1, gk, gtheta))
    gev_lp = gev_logpdf(-d1, mu, sigma, xi)
    gev_val = (1.0 - eps) * jnp.where(jnp.isfinite(gev_lp),
                                      jnp.exp(gev_lp), 0.0)
    posterior = gam_val / jnp.maximum(gam_val + gev_val, 1e-30)
    posterior = jnp.where(row_mask, posterior, 0.0)
    weights = jnp.where(predicted, posterior, 0.0)
    params = EvsacMixtureParams(gk, gtheta, mu, sigma, xi, eps)
    return posterior, weights, params


@partial(jax.jit, static_argnames=("iters",))
def evsac_probabilities(distances, mask=None, iters: int = 30):
    """Lightweight fallback when only 1-NN distances are available
    (no (N, k) matrix for the full mixture): two-component EM in
    log-distance space. Prefer evsac_mixture for reference parity."""
    d = jnp.asarray(distances)
    if mask is None:
        mask = jnp.ones_like(d, dtype=bool)
    x = jnp.log(jnp.maximum(d, 1e-12))
    mval = jnp.where(mask, x, 0.0)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(mval) / n
    std = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0)) / n, 1e-12))

    # init: inlier mode below the mean, outlier above
    st0 = (mean - std, std * 0.5, mean + 0.5 * std, std * 0.5, 0.3)

    def em(_, st):
        mu1, s1, mu2, s2, pi = st

        def logpdf(mu, s):
            s = jnp.maximum(s, 1e-4)
            return -0.5 * ((x - mu) / s) ** 2 - jnp.log(s)

        l1 = logpdf(mu1, s1) + jnp.log(jnp.maximum(pi, 1e-6))
        l2 = logpdf(mu2, s2) + jnp.log(jnp.maximum(1 - pi, 1e-6))
        r = jnp.exp(l1 - jnp.logaddexp(l1, l2))
        r = jnp.where(mask, r, 0.0)
        n1 = jnp.maximum(jnp.sum(r), 1e-6)
        n2 = jnp.maximum(jnp.sum(jnp.where(mask, 1.0 - r, 0.0)), 1e-6)
        mu1n = jnp.sum(r * x) / n1
        mu2n = jnp.sum(jnp.where(mask, (1 - r) * x, 0.0)) / n2
        s1n = jnp.sqrt(jnp.sum(r * (x - mu1n) ** 2) / n1 + 1e-6)
        s2n = jnp.sqrt(jnp.sum(
            jnp.where(mask, (1 - r) * (x - mu2n) ** 2, 0.0)) / n2 + 1e-6)
        # keep component 1 the small-distance one
        swap = mu1n > mu2n
        mu1n, mu2n = jnp.where(swap, mu2n, mu1n), jnp.where(swap, mu1n,
                                                            mu2n)
        s1n, s2n = jnp.where(swap, s2n, s1n), jnp.where(swap, s1n, s2n)
        pin = n1 / (n1 + n2)
        pin = jnp.where(swap, 1.0 - pin, pin)
        return (mu1n, s1n, mu2n, s2n, jnp.clip(pin, 0.01, 0.99))

    mu1, s1, mu2, s2, pi = jax.lax.fori_loop(0, iters, em, st0)

    def logpdf(mu, s):
        s = jnp.maximum(s, 1e-4)
        return -0.5 * ((x - mu) / s) ** 2 - jnp.log(s)

    l1 = logpdf(mu1, s1) + jnp.log(pi)
    l2 = logpdf(mu2, s2) + jnp.log(1 - pi)
    post = jnp.exp(l1 - jnp.logaddexp(l1, l2))
    return jnp.where(mask, post, 0.0)


def weighted_samples(key, weights, sample_size, num_hypotheses):
    """Gumbel-top-k sampling proportional to `weights` per hypothesis
    (the EVSAC sampler's role; ref evsac_sampler.h Sample +
    std::discrete_distribution)."""
    logw = jnp.log(jnp.maximum(weights, 1e-12))
    g = jax.random.gumbel(key, (num_hypotheses, weights.shape[0]))
    _, idx = jax.lax.top_k(g + logw[None, :], sample_size)
    return idx

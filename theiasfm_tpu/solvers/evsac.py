"""EVSAC-style correctness-probability weighted sampling.

ref: src/theia/solvers/evsac_sampler.h (+ vendored statx/optimo): EVSAC
fits extreme-value distributions to descriptor match distances to
derive per-correspondence correctness probabilities, then samples
minimal subsets proportionally — far fewer hypotheses needed at low
inlier ratios.

This implementation fits a two-component model to the distance
population with 1-D EM (inlier component = small-distance mode,
outlier component = bulk; both Gaussian in log-distance space, which
matches the heavy-tailed behavior the GEV models in the original),
yielding posterior inlier probabilities used as sampling weights via
the Gumbel-top-k trick in the engine's `weighted` sampler.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iters",))
def evsac_probabilities(distances, mask=None, iters: int = 30):
    """Posterior inlier probability per correspondence from its match
    distance (smaller = more likely correct). Returns (N,) in [0, 1].
    """
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
    (the EVSAC sampler's role; ref evsac_sampler.h)."""
    logw = jnp.log(jnp.maximum(weights, 1e-12))
    g = jax.random.gumbel(key, (num_hypotheses, weights.shape[0]))
    _, idx = jax.lax.top_k(g + logw[None, :], sample_size)
    return idx

"""Fisher-vector global image descriptors (GMM + FV encoding) and
global-descriptor-based image pair selection.

ref: src/theia/matching/fisher_vector_extractor.{h,cc} (vlfeat GMM
training + Fisher encoding) and the kNN pair selection with query
expansion in src/theia/sfm/feature_extractor_and_matcher.cc:352-413.

TPU shape: GMM EM is dense batched responsibilities (softmax over
components — one (N, K) matmul-shaped op per step); FV encoding is a
couple of einsums; the all-pairs FV distance matrix is one matmul.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FisherVectorOptions:
    """ref: FisherVectorExtractor::Options."""
    num_gmm_clusters: int = 16
    max_num_features_for_training: int = 100_000
    em_iterations: int = 20


@partial(jax.jit, static_argnames=("K", "iters"))
def _train_gmm(X, key, K: int, iters: int):
    """Diagonal-covariance GMM via EM. X (N, D). Returns
    (means (K, D), variances (K, D), weights (K,))."""
    N, D = X.shape
    idx = jax.random.choice(key, N, (K,), replace=False)
    means = X[idx]
    var = jnp.var(X, axis=0)[None, :].repeat(K, 0) + 1e-4
    w = jnp.full((K,), 1.0 / K, X.dtype)

    def log_prob(means, var, w):
        # (N, K) log N(x; mu_k, var_k) + log w_k
        diff = X[:, None, :] - means[None, :, :]
        ll = -0.5 * jnp.sum(diff * diff / var[None], axis=-1)
        ll = ll - 0.5 * jnp.sum(jnp.log(var), axis=-1)[None, :]
        return ll + jnp.log(jnp.maximum(w, 1e-12))[None, :]

    def em(_, st):
        means, var, w = st
        lp = log_prob(means, var, w)
        r = jax.nn.softmax(lp, axis=-1)            # (N, K)
        nk = jnp.sum(r, axis=0) + 1e-10
        means = (r.T @ X) / nk[:, None]
        ex2 = (r.T @ (X * X)) / nk[:, None]
        var = jnp.maximum(ex2 - means * means, 1e-4)
        w = nk / N
        return (means, var, w)

    return jax.lax.fori_loop(0, iters, em, (means, var, w))


@jax.jit
def _fisher_encode(X, mask, means, var, w):
    """Improved Fisher vector of one image's descriptors.

    X (N, D), mask (N,). Returns (2*K*D,) power+L2-normalized.
    """
    diff = X[:, None, :] - means[None, :, :]
    ll = -0.5 * jnp.sum(diff * diff / var[None], axis=-1)
    ll = ll - 0.5 * jnp.sum(jnp.log(var), axis=-1)[None, :]
    ll = ll + jnp.log(jnp.maximum(w, 1e-12))[None, :]
    r = jax.nn.softmax(ll, axis=-1) * mask[:, None]      # (N, K)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    sigma = jnp.sqrt(var)
    u = diff / sigma[None]                                # (N, K, D)
    g_mu = jnp.einsum("nk,nkd->kd", r, u) / \
        (n * jnp.sqrt(jnp.maximum(w, 1e-12))[:, None])
    g_sig = jnp.einsum("nk,nkd->kd", r, u * u - 1.0) / \
        (n * jnp.sqrt(2.0 * jnp.maximum(w, 1e-12))[:, None])
    fv = jnp.concatenate([g_mu.reshape(-1), g_sig.reshape(-1)])
    fv = jnp.sign(fv) * jnp.sqrt(jnp.abs(fv))            # power norm
    return fv / jnp.maximum(jnp.linalg.norm(fv), 1e-12)


class FisherVectorExtractor:
    """ref: FisherVectorExtractor (train on pooled descriptors, then
    encode per image)."""

    def __init__(self, options: FisherVectorOptions =
                 FisherVectorOptions(), seed: int = 0):
        self.options = options
        self.key = jax.random.PRNGKey(seed)
        self.gmm = None

    def train(self, descriptors: np.ndarray):
        X = np.asarray(descriptors, np.float32)
        cap = self.options.max_num_features_for_training
        if X.shape[0] > cap:
            sel = np.random.default_rng(0).choice(X.shape[0], cap,
                                                  replace=False)
            X = X[sel]
        self.gmm = _train_gmm(jnp.asarray(X), self.key,
                              self.options.num_gmm_clusters,
                              self.options.em_iterations)

    def extract_global_descriptor(self, descriptors: np.ndarray,
                                  mask=None) -> np.ndarray:
        assert self.gmm is not None, "call train() first"
        X = jnp.asarray(np.asarray(descriptors, np.float32))
        m = (jnp.ones(X.shape[0]) if mask is None
             else jnp.asarray(mask, jnp.float32))
        return np.asarray(_fisher_encode(X, m, *self.gmm))


def select_image_pairs_from_global_descriptors(
        global_descriptors: Dict[str, np.ndarray],
        num_nearest_neighbors: int = 20,
        use_query_expansion: bool = True) -> List[Tuple[str, str]]:
    """kNN candidate pairs over FV similarity + one round of query
    expansion (ref feature_extractor_and_matcher.cc:352-413)."""
    names = sorted(global_descriptors.keys())
    if len(names) < 2:
        return []
    F = np.stack([global_descriptors[n] for n in names])
    sim = F @ F.T
    np.fill_diagonal(sim, -np.inf)
    k = min(num_nearest_neighbors, len(names) - 1)
    pairs: Set[Tuple[str, str]] = set()
    knn = np.argsort(-sim, axis=1)[:, :k]
    for i in range(len(names)):
        for j in knn[i]:
            a, b = names[i], names[int(j)]
            pairs.add((a, b) if a < b else (b, a))
    if use_query_expansion:
        # neighbors-of-neighbors (one hop)
        adj: Dict[int, Set[int]] = {i: set() for i in range(len(names))}
        name_idx = {n: i for i, n in enumerate(names)}
        for (a, b) in pairs:
            adj[name_idx[a]].add(name_idx[b])
            adj[name_idx[b]].add(name_idx[a])
        for i in range(len(names)):
            for j in list(adj[i]):
                for l in adj[j]:
                    if l != i:
                        a, b = names[i], names[l]
                        pairs.add((a, b) if a < b else (b, a))
    return sorted(pairs)

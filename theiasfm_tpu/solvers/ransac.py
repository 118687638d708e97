"""Batched hypothesize-and-verify robust estimation (the RANSAC engine).

TPU-native counterpart of the reference's solver framework
(ref: src/theia/solvers/estimator.h:54-95,
src/theia/solvers/sample_consensus_estimator.h:57-136 and the
RANSAC/PROSAC/LMed/Exhaustive variants).

Design shift (SURVEY.md §7): the reference runs a sequential adaptive
loop — sample, solve, score, update termination bound — per problem.
That shape (data-dependent trip counts, early exits) is hostile to XLA.
Here ALL hypotheses are generated and scored in one fixed-shape batched
computation: sample H minimal subsets -> vmap the minimal solver ->
score every (model, datum) pair in parallel -> masked argmax. The
adaptive-termination math is kept, but inverted: it *reports* the
confidence achieved by the static hypothesis budget instead of gating a
loop (RansacSummary mirrors ref RansacSummary fields).

Quality measures: 'inlier' (InlierSupport), 'mle'
(MLEQualityMeasurement), 'msac' (truncated quadratic,
the MLE-style score), 'lmed' (least median of squares) — ref
quality_measurement.h variants.

Samplers: uniform (RandomSampler), PROSAC progressive pools
(ProsacSampler), exhaustive pairs (ExhaustiveSampler) — ref
solvers/*sampler.h.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RansacOptions:
    """Static configuration (hashable; safe as a jit static arg).

    ref RansacParameters (sample_consensus_estimator.h:57-130); the
    max_iterations/min_iterations pair becomes `num_hypotheses`.
    """
    error_thresh: float  # threshold on the *squared* residual, like ref
    num_hypotheses: int = 512
    quality: str = "inlier"          # 'inlier'|'msac'|'mle'|'lmed'
    sampler: str = "random"          # 'random' | 'prosac' | 'exhaustive'
    failure_probability: float = 0.01
    model_chunk: int = 128           # score this many models at a time


class RansacSummary(NamedTuple):
    """ref RansacSummary (sample_consensus_estimator.h:132+)."""
    inliers: jnp.ndarray          # (N,) bool mask
    num_inliers: jnp.ndarray      # scalar int
    num_hypotheses: int
    confidence: jnp.ndarray       # 1 - (1 - w^s)^H achieved by the budget
    best_score: jnp.ndarray       # engine-internal score of the winner


@dataclasses.dataclass(frozen=True)
class MinimalSolverSpec:
    """A minimal solver adapted to the engine.

    solve: (data_subset pytree with leading dim sample_size)
           -> (models pytree [max_models, ...], valid [max_models] bool)
    residuals: (model, data) -> (N,) squared errors
    refine: optional (model, data, weights (N,)) -> model, a nonminimal
            weighted re-estimation on inliers (ref Estimator::RefineModel).
    degeneracy test lives inside `solve` (emit valid=False).
    """
    name: str
    sample_size: int
    max_models: int
    solve: Callable[[Any], tuple]
    residuals: Callable[[Any, Any], jnp.ndarray]
    refine: Optional[Callable[[Any, Any, jnp.ndarray], Any]] = None


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def random_samples(key, num_data, sample_size, num_hypotheses,
                   valid_mask=None):
    """(H, s) index samples, approximately without replacement within a
    hypothesis (Gumbel top-k over per-hypothesis random scores — exact
    without-replacement sampling, fully vectorized)."""
    g = jax.random.gumbel(key, (num_hypotheses, num_data))
    if valid_mask is not None:
        g = jnp.where(valid_mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def prosac_samples(key, num_data, sample_size, num_hypotheses,
                   valid_mask=None):
    """PROSAC-style progressive sampling (ref prosac_sampler.h): data is
    assumed sorted by quality; hypothesis h draws from the top-n_h pool,
    with n_h growing from sample_size+1 to num_data across the budget."""
    g = jax.random.gumbel(key, (num_hypotheses, num_data))
    h = jnp.arange(num_hypotheses)
    # pool size grows linearly (the classic PROSAC growth function's
    # net effect under a fixed budget)
    pool = sample_size + 1 + (
        (num_data - sample_size - 1) * h // max(num_hypotheses - 1, 1))
    in_pool = jnp.arange(num_data)[None, :] < pool[:, None]
    g = jnp.where(in_pool, g, -jnp.inf)
    if valid_mask is not None:
        g = jnp.where(valid_mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def exhaustive_pair_samples(num_data, num_hypotheses):
    """All (i, j) pairs, row-major, truncated/padded to the budget
    (ref exhaustive_sampler.h supports sample_size 2)."""
    i, j = jnp.triu_indices(num_data, k=1)
    idx = jnp.stack([i, j], axis=-1)
    H = num_hypotheses
    reps = -(-H // idx.shape[0])
    return jnp.tile(idx, (reps, 1))[:H]


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

def _score_models(residual_fn, models, models_valid, data, data_mask,
                  options: RansacOptions):
    """Score all models; return (scores [M], inlier counts [M]).

    Higher score is better for all quality modes (lmed negated).
    """
    thresh = options.error_thresh

    def score_chunk(model_chunk):
        r = jax.vmap(lambda m: residual_fn(m, data))(model_chunk)  # (C, N)
        if data_mask is not None:
            r = jnp.where(data_mask[None, :], r, jnp.inf)
        inl = r < thresh
        n_inl = jnp.sum(inl, axis=-1)
        if options.quality == "inlier":
            score = n_inl.astype(r.dtype)
        elif options.quality == "msac":
            score = -jnp.sum(jnp.minimum(r, thresh), axis=-1)
        elif options.quality == "mle":
            # ref MLEQualityMeasurement (solvers/mle_quality_measurement.h):
            # cost = sum of per-datum negative log-likelihoods under an
            # inlier Gaussian + uniform outlier mixture; here the standard
            # truncated form exp(-r/(2*sigma^2)) with sigma tied to the
            # threshold, accumulated in log space.
            sigma2 = (thresh / 3.0) ** 2
            lik = jnp.exp(-jnp.minimum(r, thresh) / (2.0 * sigma2))
            score = jnp.sum(jnp.log(lik + 1e-12), axis=-1)
        elif options.quality == "lmed":
            if data_mask is not None:
                # median over valid data only: replace invalid with +inf and
                # take the k-th smallest with k = n_valid // 2
                n_valid = jnp.sum(data_mask)
                k = jnp.maximum(n_valid // 2, 1)
                sort_r = jnp.sort(r, axis=-1)
                score = -jnp.take_along_axis(
                    sort_r, jnp.broadcast_to(k - 1, (r.shape[0], 1)),
                    axis=-1)[:, 0]
            else:
                score = -jnp.median(r, axis=-1)
        else:
            raise ValueError(options.quality)
        return score, n_inl

    M = jax.tree_util.tree_leaves(models)[0].shape[0]
    C = min(options.model_chunk, M)
    if M % C == 0 and M > C:
        chunked = jax.tree.map(
            lambda x: x.reshape((M // C, C) + x.shape[1:]), models)
        score, n_inl = jax.lax.map(score_chunk, chunked)
        score = score.reshape(M)
        n_inl = n_inl.reshape(M)
    else:
        score, n_inl = score_chunk(models)
    score = jnp.where(models_valid, score, -jnp.inf)
    return score, n_inl


def ransac(key, spec: MinimalSolverSpec, data, options: RansacOptions,
           data_mask=None, num_data=None, sort_order=None,
           sample_weights=None):
    """Run batched RANSAC.

    Args:
      key: PRNG key (determinism contract mirrors the reference's
        shared RandomNumberGenerator threading, ref util/random.h).
      spec: the minimal solver adapter.
      data: pytree of arrays with leading dim N (static).
      options: RansacOptions (static).
      data_mask: optional (N,) bool — padded/invalid data.
      num_data: optional override of N for confidence computation.
      sort_order: optional (N,) permutation by quality for PROSAC.
    Returns:
      (best_model, RansacSummary). best_model is refined on inliers when
      spec.refine is given.
    """
    N = jax.tree_util.tree_leaves(data)[0].shape[0]
    H = options.num_hypotheses

    if options.sampler == "weighted" or (options.sampler == "random" and
                                         sample_weights is not None):
        # EVSAC-style probability-proportional sampling
        # (ref evsac_sampler.h; weights from solvers/evsac.py)
        from .evsac import weighted_samples
        w = sample_weights
        if data_mask is not None:
            w = w * data_mask
        idx = weighted_samples(key, w, spec.sample_size, H)
    elif options.sampler == "random":
        idx = random_samples(key, N, spec.sample_size, H, data_mask)
    elif options.sampler == "prosac":
        if sort_order is not None:
            # sample in sorted space, then map back
            idx_sorted = prosac_samples(key, N, spec.sample_size, H,
                                        data_mask)
            idx = sort_order[idx_sorted]
        else:
            idx = prosac_samples(key, N, spec.sample_size, H, data_mask)
    elif options.sampler == "exhaustive":
        idx = exhaustive_pair_samples(N, H)
    else:
        raise ValueError(options.sampler)

    subsets = jax.tree.map(lambda x: x[idx], data)  # leading (H, s)
    models, valid = jax.vmap(spec.solve)(subsets)
    # flatten hypothesis x model axes
    models = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), models)
    valid = valid.reshape(-1)

    score, n_inl = _score_models(spec.residuals, models, valid, data,
                                 data_mask, options)
    best = jnp.argmax(score)
    best_model = jax.tree.map(lambda x: x[best], models)

    r_best = spec.residuals(best_model, data)
    inliers = r_best < options.error_thresh
    if data_mask is not None:
        inliers = inliers & data_mask
    num_inliers = jnp.sum(inliers)

    if spec.refine is not None:
        w = inliers.astype(r_best.dtype)
        refined = spec.refine(best_model, data, w)
        # keep refinement only if it does not lose inliers
        r_ref = spec.residuals(refined, data)
        inl_ref = r_ref < options.error_thresh
        if data_mask is not None:
            inl_ref = inl_ref & data_mask
        better = jnp.sum(inl_ref) >= num_inliers
        best_model = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(better, (1,) * a.ndim), a, b), refined,
            best_model)
        inliers = jnp.where(better, inl_ref, inliers)
        num_inliers = jnp.sum(inliers)

    n_total = num_data if num_data is not None else (
        jnp.sum(data_mask) if data_mask is not None else N)
    w_ratio = num_inliers / jnp.maximum(n_total, 1)
    # P(all H samples contaminated) — achieved confidence of the budget
    log_fail = H * jnp.log1p(-jnp.minimum(w_ratio ** spec.sample_size,
                                          1 - 1e-12))
    confidence = 1.0 - jnp.exp(log_fail)

    summary = RansacSummary(
        inliers=inliers, num_inliers=num_inliers, num_hypotheses=H,
        confidence=confidence, best_score=score[best])
    return best_model, summary


def ransac_adaptive(key, spec: MinimalSolverSpec, data,
                    options: RansacOptions, data_mask=None,
                    num_data=None, sort_order=None, sample_weights=None,
                    min_hypotheses: int = 32):
    """Bucketed adaptive termination around the one-shot engine.

    The reference's sequential loop stops as soon as the iteration
    count k satisfies k >= log(delta) / log(1 - w^s) for the current
    inlier ratio w (ref sample_consensus_estimator.h:148+ —
    max_iterations update after every better model). A sequential loop
    is hostile to XLA, but the same adaptive *compute* profile is
    recovered with geometrically growing hypothesis buckets: run the
    batched engine with H = 32, 128, 512, ... (each bucket hits the
    jit cache), and stop when the cumulative budget satisfies the same
    bound for the best model found so far. Easy problems (high w) exit
    after the first bucket — matching the reference's small adaptive
    iteration counts — while hard ones escalate to
    options.num_hypotheses.

    Returns (best_model, RansacSummary) where num_hypotheses is the
    total budget actually spent and confidence is the cumulative
    1 - (1 - w^s)^H_total.
    """
    import math

    H_max = options.num_hypotheses
    H = min(min_hypotheses, H_max)
    delta = options.failure_probability
    best_model, best_summary = None, None
    total_H = 0
    while True:
        key, sub = jax.random.split(key)
        opts_b = dataclasses.replace(options, num_hypotheses=H)
        model, summary = ransac(sub, spec, data, opts_b,
                                data_mask=data_mask, num_data=num_data,
                                sort_order=sort_order,
                                sample_weights=sample_weights)
        total_H += H
        if (best_summary is None or
                int(summary.num_inliers) > int(best_summary.num_inliers)):
            best_model, best_summary = model, summary
        # cumulative confidence for the best-so-far inlier ratio —
        # the reference's termination bound evaluated at total_H
        n_tot = (num_data if num_data is not None else
                 int(jnp.sum(data_mask)) if data_mask is not None else
                 jax.tree_util.tree_leaves(data)[0].shape[0])
        w = float(best_summary.num_inliers) / max(int(n_tot), 1)
        ws = min(w ** spec.sample_size, 1.0 - 1e-12)
        conf = 1.0 - math.exp(total_H * math.log1p(-ws))
        if conf >= 1.0 - delta or total_H >= H_max:
            break
        H = min(H * 4, H_max - total_H)
    summary = best_summary._replace(
        num_hypotheses=total_H,
        confidence=jnp.asarray(conf, jnp.float32))
    return best_model, summary


def hypotheses_for_confidence(sample_size: int, inlier_ratio: float,
                              failure_probability: float = 0.01) -> int:
    """Static helper: hypothesis budget H s.t. P(no all-inlier sample) <
    failure_probability — the same bound the reference uses to adapt its
    loop (sample_consensus_estimator.h termination), used here to SIZE
    the batch up front."""
    import math
    w = inlier_ratio ** sample_size
    if w >= 1.0:
        return 1
    return max(1, int(math.ceil(math.log(failure_probability) /
                                math.log(1.0 - w))))

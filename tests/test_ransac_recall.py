"""RANSAC recall parity vs the reference's adaptive termination
(SURVEY.md hard part #2; ref sample_consensus_estimator.h:148+).

The reference's sequential loop adapts its iteration count to
k(w) = log(delta) / log(1 - w^s) for observed inlier ratio w. The
batched one-shot engine must show EQUAL inlier recall when its fixed
hypothesis budget is sized by the same bound — i.e. at matched compute
— across inlier ratios 0.1..0.9, and the bucketed adaptive wrapper
must spend only a small budget on easy (high-w) problems.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu.solvers.ransac import (
    MinimalSolverSpec, RansacOptions, hypotheses_for_confidence, ransac,
    ransac_adaptive)


def _line_spec():
    """2-point 2D line fit: model (nx, ny, d) with n'x = d."""
    def solve(pts):
        p0, p1 = pts[0], pts[1]
        t = p1 - p0
        n = jnp.stack([-t[1], t[0]])
        nrm = jnp.linalg.norm(n)
        valid = nrm > 1e-9
        n = n / jnp.where(valid, nrm, 1.0)
        d = jnp.dot(n, p0)
        return jnp.concatenate([n, d[None]])[None, :], valid[None]

    def residuals(model, pts):
        n, d = model[:2], model[2]
        return (pts @ n - d) ** 2

    return MinimalSolverSpec(name="line2d", sample_size=2, max_models=1,
                             solve=solve, residuals=residuals)


def _make_line_data(rng, n, inlier_ratio, noise=0.02):
    n_in = int(round(n * inlier_ratio))
    x = rng.uniform(-1, 1, n_in)
    y = 0.4 * x + 0.2 + rng.normal(scale=noise, size=n_in)
    inl = np.stack([x, y], -1)
    out = rng.uniform(-2, 2, size=(n - n_in, 2))
    pts = np.concatenate([inl, out])
    is_inl = np.zeros(n, bool)
    is_inl[:n_in] = True
    perm = rng.permutation(n)
    return jnp.asarray(pts[perm], jnp.float32), is_inl[perm]


THRESH = (3 * 0.02) ** 2  # 3-sigma squared residual threshold


@pytest.mark.parametrize("ratio", [0.1, 0.2, 0.3, 0.5, 0.7, 0.9])
def test_recall_at_reference_budget(ratio):
    """At the reference's own adaptive iteration count for each inlier
    ratio, the one-shot engine must recover >=90% of true inliers in
    >=90% of trials (equal recall at equal compute)."""
    spec = _line_spec()
    # the reference floors its adaptive loop at min_iterations=100
    # (sample_consensus_estimator.h:62) — same floor here
    H = max(hypotheses_for_confidence(spec.sample_size, ratio, 0.01),
            100)
    opts = RansacOptions(error_thresh=THRESH, num_hypotheses=H,
                         quality="inlier")
    rng = np.random.default_rng(int(ratio * 100))
    trials, hits = 12, 0
    run = jax.jit(lambda k, d: ransac(k, spec, d, opts),
                  static_argnames=())
    for t in range(trials):
        pts, is_inl = _make_line_data(rng, 200, ratio)
        key = jax.random.PRNGKey(t)
        _, summary = run(key, pts)
        found = np.asarray(summary.inliers)
        recall = (found & is_inl).sum() / max(is_inl.sum(), 1)
        if recall >= 0.9:
            hits += 1
    assert hits >= int(0.9 * trials), (ratio, H, hits, trials)


def test_adaptive_buckets_cheap_on_easy_problems():
    """The bucketed adaptive wrapper must terminate within the first
    bucket on high-inlier-ratio data (the reference's loop runs ~5
    iterations at w=0.9) and still meet the confidence bound."""
    spec = _line_spec()
    rng = np.random.default_rng(0)
    pts, is_inl = _make_line_data(rng, 200, 0.9)
    opts = RansacOptions(error_thresh=THRESH, num_hypotheses=4096)
    model, summary = ransac_adaptive(jax.random.PRNGKey(0), spec, pts,
                                     opts, min_hypotheses=32)
    assert summary.num_hypotheses == 32, summary.num_hypotheses
    assert float(summary.confidence) >= 0.99
    found = np.asarray(summary.inliers)
    assert (found & is_inl).sum() / is_inl.sum() >= 0.9


def test_adaptive_buckets_escalate_on_hard_problems():
    """At w=0.15 the confidence bound needs ~200 hypotheses: the
    wrapper must escalate past the first bucket and still find the
    structure."""
    spec = _line_spec()
    rng = np.random.default_rng(3)
    pts, is_inl = _make_line_data(rng, 200, 0.15)
    opts = RansacOptions(error_thresh=THRESH, num_hypotheses=4096)
    model, summary = ransac_adaptive(jax.random.PRNGKey(1), spec, pts,
                                     opts, min_hypotheses=32)
    assert summary.num_hypotheses > 32, summary.num_hypotheses
    found = np.asarray(summary.inliers)
    assert (found & is_inl).sum() / is_inl.sum() >= 0.9

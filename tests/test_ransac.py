"""RANSAC engine tests mirroring ref: src/theia/solvers/*_test.cc
(line-fitting estimator with outliers; all samplers/quality modes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu.solvers import (MinimalSolverSpec, RansacOptions, ransac)
from theiasfm_tpu.solvers.ransac import hypotheses_for_confidence


def line_spec():
    """Fit y = m x + b from 2 points; residual = squared vertical dist."""
    def solve(pts):  # pts (2, 2)
        dx = pts[1, 0] - pts[0, 0]
        degenerate = jnp.abs(dx) < 1e-9
        m = (pts[1, 1] - pts[0, 1]) / jnp.where(degenerate, 1.0, dx)
        b = pts[0, 1] - m * pts[0, 0]
        return jnp.stack([m, b])[None, :], ~degenerate[None]

    def residuals(model, pts):
        pred = model[0] * pts[:, 0] + model[1]
        return (pts[:, 1] - pred) ** 2

    def refine(model, pts, w):
        # weighted least squares line fit
        W = w
        sw = jnp.sum(W) + 1e-12
        mx = jnp.sum(W * pts[:, 0]) / sw
        my = jnp.sum(W * pts[:, 1]) / sw
        cov = jnp.sum(W * (pts[:, 0] - mx) * (pts[:, 1] - my))
        var = jnp.sum(W * (pts[:, 0] - mx) ** 2) + 1e-12
        m = cov / var
        b = my - m * mx
        return jnp.stack([m, b])

    return MinimalSolverSpec("line", 2, 1, solve, residuals, refine)


def make_line_data(rng, n_inl=80, n_out=20, m=2.0, b=-1.0, noise=0.05):
    x = rng.uniform(-10, 10, size=n_inl)
    y = m * x + b + rng.normal(scale=noise, size=n_inl)
    inl = np.stack([x, y], -1)
    out = rng.uniform(-10, 10, size=(n_out, 2)) * np.array([1.0, 5.0])
    data = np.concatenate([inl, out])
    perm = rng.permutation(len(data))
    return jnp.asarray(data[perm]), perm


@pytest.mark.parametrize("quality", ["inlier", "msac", "mle", "lmed"])
def test_line_fit(quality, rng, key):
    data, _ = make_line_data(rng)
    opts = RansacOptions(error_thresh=0.1, num_hypotheses=128,
                         quality=quality)
    model, summary = ransac(key, line_spec(), data, opts)
    m, b = np.asarray(model)
    assert abs(m - 2.0) < 0.05 and abs(b + 1.0) < 0.1
    assert int(summary.num_inliers) >= 70
    assert float(summary.confidence) > 0.99


@pytest.mark.parametrize("sampler", ["random", "prosac", "exhaustive"])
def test_samplers(sampler, rng, key):
    data, _ = make_line_data(rng, n_inl=40, n_out=10)
    opts = RansacOptions(error_thresh=0.1, num_hypotheses=256,
                         sampler=sampler)
    model, summary = ransac(key, line_spec(), data, opts)
    m, b = np.asarray(model)
    assert abs(m - 2.0) < 0.05 and abs(b + 1.0) < 0.12


def test_data_mask(rng, key):
    data, _ = make_line_data(rng, n_inl=60, n_out=0)
    # pad with garbage that the mask must exclude
    pad = jnp.asarray(rng.uniform(-100, 100, size=(40, 2)))
    full = jnp.concatenate([data, pad])
    mask = jnp.concatenate([jnp.ones(60, bool), jnp.zeros(40, bool)])
    opts = RansacOptions(error_thresh=0.1, num_hypotheses=128)
    model, summary = ransac(key, line_spec(), full, opts, data_mask=mask)
    m, b = np.asarray(model)
    assert abs(m - 2.0) < 0.05
    assert not np.any(np.asarray(summary.inliers)[60:])


def test_jit_and_vmap(rng, key):
    """The engine must be jittable (static spec/options via closure)."""
    data, _ = make_line_data(rng)
    spec = line_spec()
    opts = RansacOptions(error_thresh=0.1, num_hypotheses=64)

    @jax.jit
    def run(k, d):
        return ransac(k, spec, d, opts)

    model, summary = run(key, data)
    assert abs(float(model[0]) - 2.0) < 0.1
    # batched over problems
    keys = jax.random.split(key, 4)
    datas = jnp.stack([data] * 4)
    models, summaries = jax.vmap(lambda k, d: ransac(k, spec, d, opts))(
        keys, datas)
    assert models.shape == (4, 2)


def test_hypotheses_for_confidence():
    h = hypotheses_for_confidence(2, 0.5, 0.01)
    assert 15 <= h <= 17  # log(0.01)/log(0.75) ~ 16
    assert hypotheses_for_confidence(5, 0.9, 0.01) < 10


def test_evsac_weighted_sampling(rng, key):
    """EVSAC-style weighted sampling beats uniform at low inlier ratio
    (ref evsac_sampler role)."""
    from theiasfm_tpu.solvers.evsac import evsac_probabilities
    # 20% inliers; inliers have small "match distances"
    data, _ = make_line_data(rng, n_inl=30, n_out=120)
    # rebuild with known layout: first 30 rows inliers
    x = rng.uniform(-10, 10, size=30)
    inl = np.stack([x, 2.0 * x - 1.0 + rng.normal(scale=0.05, size=30)],
                   -1)
    out = rng.uniform(-10, 10, size=(120, 2)) * np.array([1.0, 5.0])
    data = jnp.asarray(np.concatenate([inl, out]))
    dist = np.concatenate([rng.uniform(0.1, 0.3, 30),
                           rng.uniform(0.4, 1.0, 120)])
    probs = evsac_probabilities(jnp.asarray(dist))
    probs_np = np.asarray(probs)
    assert probs_np[:30].mean() > probs_np[30:].mean() + 0.3

    opts = RansacOptions(error_thresh=0.1, num_hypotheses=24,
                         sampler="weighted")
    model, summary = ransac(key, line_spec(), data, opts,
                            sample_weights=probs)
    m, b = np.asarray(model)
    assert abs(m - 2.0) < 0.05 and abs(b + 1.0) < 0.15

"""Tests for L1/QP solvers and probability utilities
(ref: src/theia/math/l1_solver_test.cc, qp_solver_test.cc,
sequential_probability_ratio_test.cc patterns)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math.l1_solver import (constrained_l1_solve, l1_solve,
                                         qp_solve_box)
from theiasfm_tpu.math.probability import (Histogram, ReservoirSampler,
                                           sprt_decision_threshold,
                                           sequential_probability_ratio_test)


def test_l1_solver_robust_to_outliers(rng):
    # ref l1_solver_test: L1 regression ignores sparse gross outliers
    n, m = 5, 200
    x_true = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = A @ x_true + rng.normal(scale=0.01, size=m)
    idx = rng.choice(m, 20, replace=False)
    b[idx] += rng.normal(scale=20.0, size=20)
    x = np.asarray(l1_solve(jnp.asarray(A), jnp.asarray(b), iters=200))
    assert np.linalg.norm(x - x_true) < 0.05, x - x_true
    # least squares would be much worse
    x_ls = np.linalg.lstsq(A, b, rcond=None)[0]
    assert np.linalg.norm(x - x_true) < 0.3 * np.linalg.norm(
        x_ls - x_true)


def test_constrained_l1(rng):
    n, m = 4, 100
    x_true = np.abs(rng.normal(size=n)) + 0.5
    A = rng.normal(size=(m, n))
    b = A @ x_true
    # constraint: x >= 0.2 i.e. -x <= -0.2
    C = -np.eye(n)
    d = -0.2 * np.ones(n)
    x = np.asarray(constrained_l1_solve(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(C), jnp.asarray(d),
        iters=300))
    assert np.all(x >= 0.2 - 1e-5)
    assert np.linalg.norm(x - x_true) < 0.05


def _ref_qp():
    """The reference's rigged QP (qp_solver_test.cc:44-56):
    unconstrained minimum at (3, 5, 7)."""
    P = np.array([[5., -2, -1], [-2, 4, 3], [-1, 3, 5]])
    q = np.array([2., -35, -47])
    return P, q


def test_qp_admm_unbounded():
    """ref qp_solver_test.cc TEST(QPSolver, Unbounded)."""
    from theiasfm_tpu.math.l1_solver import QPSolver
    P, q = _ref_qp()
    x = np.asarray(QPSolver(P, q, r=5.0, max_num_iterations=300)
                   .solve())
    np.testing.assert_allclose(x, [3, 5, 7], atol=1e-3)


def test_qp_admm_loose_bounds():
    """ref qp_solver_test.cc TEST(QPSolver, LooseBounds): bounds that
    do not bind leave the unconstrained optimum."""
    from theiasfm_tpu.math.l1_solver import QPSolver
    P, q = _ref_qp()
    s = QPSolver(P, q, r=5.0, max_num_iterations=300)
    s.set_lower_bound([0, 0, 0])
    s.set_upper_bound([10, 10, 10])
    np.testing.assert_allclose(np.asarray(s.solve()), [3, 5, 7],
                               atol=1e-3)


def test_qp_admm_tight_bounds():
    """ref qp_solver_test.cc TEST(QPSolver, TightBounds): binding
    lower bounds (5, 7, 9) clamp the solution."""
    from theiasfm_tpu.math.l1_solver import QPSolver
    P, q = _ref_qp()
    s = QPSolver(P, q, r=5.0, max_num_iterations=1000)
    s.set_lower_bound([5, 7, 9])
    s.set_upper_bound([10, 12, 14])
    np.testing.assert_allclose(np.asarray(s.solve()), [5, 7, 9],
                               atol=1e-3)


def test_qp_box(rng):
    n = 6
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    x_uncon = rng.normal(size=n)
    q = -P @ x_uncon
    lo, hi = -0.5 * np.ones(n), 0.5 * np.ones(n)
    x = np.asarray(qp_solve_box(jnp.asarray(P), jnp.asarray(q),
                                jnp.asarray(lo), jnp.asarray(hi),
                                iters=500))
    x_expected = np.clip(x_uncon, -10, 10)
    # KKT check: projected gradient is ~0
    g = P @ x + q
    active_lo = x <= lo + 1e-6
    active_hi = x >= hi - 1e-6
    free = ~(active_lo | active_hi)
    assert np.abs(g[free]).max(initial=0.0) < 1e-4
    assert np.all(g[active_lo] >= -1e-4)
    assert np.all(g[active_hi] <= 1e-4)


def test_sprt():
    a = sprt_decision_threshold(0.05, 0.6)
    assert a > 1.0
    good = np.full(100, 0.001)
    ok, n, ratio = sequential_probability_ratio_test(
        good, 0.01, 0.05, 0.6, a)
    assert ok and ratio == 1.0
    bad = np.full(100, 10.0)
    ok, n, ratio = sequential_probability_ratio_test(
        bad, 0.01, 0.05, 0.6, a)
    assert not ok and n < 50  # early rejection


def test_histogram_and_reservoir(rng):
    h = Histogram([0.0, 1.0, 2.0, 3.0])
    for v in [0.5, 1.5, 1.7, 2.5, 10.0]:
        h.add(v)
    assert h.counts.sum() == 5
    rs = ReservoirSampler(10, seed=1)
    for i in range(1000):
        rs.add(i)
    assert len(rs.samples) == 10 and rs.n_seen == 1000


def test_normalized_cut(rng):
    """Two dense clusters with a weak bridge must split at the bridge
    (ref normalized_graph_cut_test.cc pattern)."""
    from theiasfm_tpu.math.normalized_cut import normalized_cut
    edges, weights = [], []
    for c in range(2):
        base = c * 10
        for i in range(10):
            for j in range(i + 1, 10):
                if rng.uniform() < 0.7:
                    edges.append((base + i, base + j))
                    weights.append(1.0)
    edges.append((0, 10))
    weights.append(0.1)
    labels, ncut = normalized_cut(20, np.asarray(edges),
                                  np.asarray(weights))
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]
    assert ncut < 0.1

"""L1-norm minimization solvers (ADMM), batched/jittable.

ref: src/theia/math/l1_solver.h:85-90 (ADMM least-absolute-deviations
with one reusable Cholesky factorization) and
src/theia/math/constrained_l1_solver.h (L1 with linear inequality
constraints, used by the LUD position estimator,
least_unsquared_deviation_position_estimator.cc:45,102-105).

TPU shape: the per-iteration solve reuses a single dense Cholesky
factor (cho_factor once, cho_solve per iteration — same trick as the
reference's SparseCholeskyLLt reuse), shrinkage/projection are
elementwise VPU ops, and the whole loop is a lax.fori_loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


@partial(jax.jit, static_argnames=("iters",))
def l1_solve(A, b, iters: int = 100, rho: float = 1.0):
    """min_x ||A x - b||_1 via ADMM.

    A (M, N) dense (use the matrix-free IRLS in global_pose for the
    huge sparse cases). Returns x (N,).
    """
    AtA = A.T @ A + 1e-10 * jnp.eye(A.shape[1], dtype=A.dtype)
    factor = cho_factor(AtA)

    def shrink(v, kappa):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - kappa, 0.0)

    def body(_, st):
        x, z, u = st
        x = cho_solve(factor, A.T @ (b + z - u))
        Ax = A @ x
        z = shrink(Ax - b + u, 1.0 / rho)
        u = u + Ax - b - z
        return (x, z, u)

    M = A.shape[0]
    x0 = cho_solve(factor, A.T @ b)
    st = (x0, jnp.zeros(M, A.dtype), jnp.zeros(M, A.dtype))
    x, _, _ = jax.lax.fori_loop(0, iters, body, st)
    return x


@partial(jax.jit, static_argnames=("iters",))
def constrained_l1_solve(A, b, C, d, iters: int = 200, rho: float = 1.0):
    """min_x ||A x - b||_1  s.t.  C x <= d  (ADMM with slack
    projection). A (M, N), C (P, N). Returns x (N,)."""
    K = jnp.concatenate([A, C], axis=0)
    KtK = K.T @ K + 1e-10 * jnp.eye(K.shape[1], dtype=A.dtype)
    factor = cho_factor(KtK)
    M = A.shape[0]

    def shrink(v, kappa):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - kappa, 0.0)

    def body(_, st):
        x, z, u = st
        rhs = jnp.concatenate([b, d]) + z - u
        x = cho_solve(factor, K.T @ rhs)
        Kx = K @ x
        t = Kx - jnp.concatenate([b, d]) + u
        z_l1 = shrink(t[:M], 1.0 / rho)
        z_ineq = jnp.minimum(t[M:], 0.0)  # project onto Cx - d <= 0
        z = jnp.concatenate([z_l1, z_ineq])
        u = u + Kx - jnp.concatenate([b, d]) - z
        return (x, z, u)

    x0 = cho_solve(factor, K.T @ jnp.concatenate([b, d]))
    Z = jnp.zeros(K.shape[0], A.dtype)
    x, _, _ = jax.lax.fori_loop(0, iters, body, (x0, Z, Z))
    return x


@partial(jax.jit, static_argnames=("iters",))
def qp_solve_admm(P, q, lo, hi, iters: int = 1000, rho: float = 1.0,
                  alpha: float = 1.0):
    """min_x 0.5 x^T P x + q^T x  s.t.  lo <= x <= hi — the
    reference's QPSolver algorithm exactly (src/theia/math/qp_solver.h
    / qp_solver.cc: ADMM after Boyd's quadprog, one Cholesky
    factorization of P + rho*I reused every iteration, over-relaxation
    alpha, clip-to-box z update, scaled dual u). Use +/-inf bounds for
    unbounded coordinates (the reference's defaults)."""
    n = P.shape[0]
    factor = cho_factor(P + rho * jnp.eye(n, dtype=P.dtype))

    def body(_, st):
        x, z, u = st
        x = cho_solve(factor, rho * (z - u) - q)
        x_hat = alpha * x + (1.0 - alpha) * z
        z = jnp.clip(x_hat + u, lo, hi)
        u = u + x_hat - z
        return (x, z, u)

    z0 = jnp.clip(jnp.zeros(n, P.dtype), lo, hi)
    x, z, _ = jax.lax.fori_loop(
        0, iters, body, (z0, z0, jnp.zeros(n, P.dtype)))
    return jnp.clip(z, lo, hi)


class QPSolver:
    """Object-style wrapper mirroring ref QPSolver (qp_solver.h:66-94):
    minimize 0.5 x'Px + q'x + r subject to lb <= x <= ub."""

    def __init__(self, P, q, r=0.0, max_num_iterations: int = 1000,
                 rho: float = 1.0, alpha: float = 1.0):
        self.P, self.q, self.r = jnp.asarray(P), jnp.asarray(q), r
        self.iters = max_num_iterations
        self.rho, self.alpha = rho, alpha
        n = self.P.shape[0]
        self.lb = jnp.full((n,), -jnp.inf, self.P.dtype)
        self.ub = jnp.full((n,), jnp.inf, self.P.dtype)

    def set_lower_bound(self, lb):
        self.lb = jnp.asarray(lb, self.P.dtype)

    def set_upper_bound(self, ub):
        self.ub = jnp.asarray(ub, self.P.dtype)

    def solve(self):
        return qp_solve_admm(self.P, self.q, self.lb, self.ub,
                             iters=self.iters, rho=self.rho,
                             alpha=self.alpha)


@partial(jax.jit, static_argnames=("iters",))
def qp_solve_box(P, q, lo, hi, iters: int = 200):
    """min_x 0.5 x^T P x + q^T x  s.t.  lo <= x <= hi  (projected
    gradient with Nesterov momentum — faster than ADMM when a loose
    solution suffices). ref: src/theia/math/qp_solver.h.
    """
    L = jnp.linalg.norm(P, ord=2) + 1e-9  # Lipschitz bound
    step = 1.0 / L

    def body(k, st):
        x, y, t = st
        g = P @ y + q
        x_new = jnp.clip(y - step * g, lo, hi)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, y_new, t_new)

    x0 = jnp.clip(-q / jnp.maximum(jnp.diag(P), 1e-9), lo, hi)
    x, _, _ = jax.lax.fori_loop(
        0, iters, body, (x0, x0, jnp.ones((), P.dtype)))
    return x

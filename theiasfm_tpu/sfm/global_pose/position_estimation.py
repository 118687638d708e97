"""Global position estimation from pairwise relative translations.

ref: src/theia/sfm/global_pose_estimation/
nonlinear_position_estimator.{h,cc} (Ceres LS over
PairwiseTranslationError) and
least_unsquared_deviation_position_estimator.{h,cc} (1DSfM-style LUD
convex program via ConstrainedL1Solver).

TPU-native shape: both become the SAME matrix-free IRLS Gauss-Newton on
the chordal pairwise-direction residual
    r_e = t_hat_ij_world - (c_j - c_i) / ||c_j - c_i||
with weights 1 (nonlinear / soft-L1) or 1/||r|| (LUD). The normal
equations are solved with Jacobi-preconditioned CG where the matvec is
gathers + segment_sums over edges. Gauge: c_0 = 0 pinned; scale pinned
by renormalizing the mean baseline each iteration.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PositionEstimatorOptions:
    """ref: NonlinearPositionEstimator::Options /
    LeastUnsquaredDeviationPositionEstimator::Options."""
    max_iterations: int = 300
    cg_iterations: int = 40
    robust_loss_width: float = 0.1  # huber width on chordal residual
    seed: int = 0


def _direction_jacobian(d, inv_norm):
    """d/dc of -(c_j - c_i)/||c_j - c_i|| wrt c_j is -(I - u u^T)/||.||;
    returns (E, 3, 3) for the c_j block (negate for c_i)."""
    u = d * inv_norm[:, None]
    eye = jnp.eye(3, dtype=d.dtype)
    return -(eye[None] - u[:, None, :] * u[:, :, None]) * inv_norm[:, None,
                                                                   None]


@partial(jax.jit, static_argnames=("opts", "num_views", "mode",
                                   "axis_name"))
def _solve_positions(init_pos, edge_i, edge_j, t_world, edge_w,
                     opts: PositionEstimatorOptions, num_views: int,
                     mode: str, axis_name=None):
    """axis_name: edge-sharded multi-chip mode — edges split over the
    mesh axis, position state replicated; all edge->view reductions and
    edge-sum scalars psum, so per-CG-iteration traffic is O(V*3)."""
    dtype = init_pos.dtype
    free = (jnp.arange(num_views) != 0)[:, None]

    def _psum(y):
        return y if axis_name is None else jax.lax.psum(y, axis_name)

    def residuals(c):
        d = c[edge_j] - c[edge_i]
        n = jnp.linalg.norm(d, axis=-1)
        inv_n = 1.0 / jnp.maximum(n, 1e-10)
        return t_world - d * inv_n[:, None], d, inv_n

    def gn_step(_, c):
        r, d, inv_n = residuals(c)
        rn = jnp.linalg.norm(r, axis=-1)
        if mode == "lud":
            w = edge_w / jnp.maximum(rn, 1e-4)
        else:
            # huber on the chordal norm
            a = opts.robust_loss_width
            w = edge_w * jnp.where(rn <= a, 1.0,
                                   a / jnp.maximum(rn, 1e-10))
        Jj = _direction_jacobian(d, inv_n)     # (E,3,3) block for c_j
        # matvec of J^T W J
        def matvec(x):
            u = jnp.einsum("eij,ej->ei", Jj, x[edge_j] - x[edge_i])
            u = u * w[:, None]
            v = jnp.einsum("eji,ej->ei", Jj, u)
            y = _psum(
                jax.ops.segment_sum(v, edge_j, num_segments=num_views) -
                jax.ops.segment_sum(v, edge_i, num_segments=num_views))
            return y * free + 1e-9 * x

        g = jnp.einsum("eji,ej->ei", Jj, r * w[:, None])
        b = -_psum(
            jax.ops.segment_sum(g, edge_j, num_segments=num_views) -
            jax.ops.segment_sum(g, edge_i, num_segments=num_views))
        b = b * free

        diagJ = jnp.einsum("eji,eji->ei", Jj, Jj) * w[:, None]
        deg = _psum(
            jax.ops.segment_sum(diagJ, edge_j, num_segments=num_views)
            + jax.ops.segment_sum(diagJ, edge_i,
                                  num_segments=num_views))
        M_inv = 1.0 / jnp.maximum(deg, 1e-10)

        def cg_body(k, st):
            x, res, p, rz = st
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
            x = x + alpha * p
            res = res - alpha * Ap
            z = res * M_inv
            rz_new = jnp.sum(res * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            p = z + beta * p
            return (x, res, p, rz_new)

        z0 = b * M_inv
        st = (jnp.zeros_like(c), b, z0, jnp.sum(b * z0))
        x, _, _, _ = jax.lax.fori_loop(0, opts.cg_iterations, cg_body, st)
        c_new = c + x

        # step acceptance on robustified cost
        def cost(cc):
            rr, _, _ = residuals(cc)
            rrn = jnp.linalg.norm(rr, axis=-1)
            if mode == "lud":
                return _psum(jnp.sum(edge_w * rrn))
            a = opts.robust_loss_width
            quad = 0.5 * rrn ** 2
            lin = a * (rrn - 0.5 * a)
            return _psum(jnp.sum(edge_w * jnp.where(rrn <= a, quad,
                                                    lin)))

        accept = cost(c_new) < cost(c)
        c = jnp.where(accept, c_new, c)
        # re-pin scale: mean baseline = 1 (scale gauge); weight-masked
        # so sharding padding edges (w = 0) don't skew the mean
        valid = (edge_w > 0).astype(dtype)
        dsum = _psum(jnp.sum(
            jnp.linalg.norm(c[edge_j] - c[edge_i], axis=-1) * valid))
        dmean = dsum / jnp.maximum(_psum(jnp.sum(valid)), 1.0)
        return c / jnp.maximum(dmean, 1e-10)

    return jax.lax.fori_loop(0, opts.max_iterations, gn_step, init_pos)


def _random_init(num_views, edges, t_world, seed):
    """Random-ish init: BFS chain along edges with unit steps (the
    reference seeds Ceres with random positions; a spanning-tree walk of
    the directions converges far faster)."""
    pos = np.zeros((num_views, 3))
    visited = {0}
    adj = {}
    for e, (i, j) in enumerate(edges):
        adj.setdefault(int(i), []).append((int(j), e, 1.0))
        adj.setdefault(int(j), []).append((int(i), e, -1.0))
    stack = [0]
    while stack:
        i = stack.pop()
        for (j, e, sgn) in adj.get(i, ()):
            if j in visited:
                continue
            visited.add(j)
            pos[j] = pos[i] + sgn * t_world[e]
            stack.append(j)
    return pos


@partial(jax.jit, static_argnames=("opts", "num_views"))
def _solve_positions_lud_convex(init_pos, edge_i, edge_j, t_world,
                                edge_w, opts: PositionEstimatorOptions,
                                num_views: int):
    """True convex LUD (Ozyesil-Singer 1DSfM formulation):

        min_{c, d}  sum_e w_e || (c_j - c_i) - d_e t_e ||
        s.t. d_e >= 1,  c_0 = 0.

    Jointly convex in (c, d); solved by block coordinate descent:
    d_e given c is closed-form (projection of the baseline onto t_e,
    clipped at 1), c given (d, IRLS weights) is a LINEAR least squares
    with constant +/-I jacobian blocks -> Jacobi-preconditioned CG over
    segment sums. Unlike the chordal GN this has no spurious minima —
    the fix for closed-loop scenes that fold under the nonconvex form.
    """
    free = (jnp.arange(num_views) != 0)[:, None]

    def bcd_step(_, c):
        base = c[edge_j] - c[edge_i]
        d = jnp.maximum(jnp.sum(base * t_world, axis=-1), 1.0)
        r = base - d[:, None] * t_world
        rn = jnp.linalg.norm(r, axis=-1)
        w = edge_w / jnp.maximum(rn, 1e-3)   # IRLS for the L2-norm sum
        target = d[:, None] * t_world

        def matvec(x):
            u = (x[edge_j] - x[edge_i]) * w[:, None]
            y = (jax.ops.segment_sum(u, edge_j, num_segments=num_views)
                 - jax.ops.segment_sum(u, edge_i,
                                       num_segments=num_views))
            return y * free + 1e-9 * x

        b = (jax.ops.segment_sum(target * w[:, None], edge_j,
                                 num_segments=num_views) -
             jax.ops.segment_sum(target * w[:, None], edge_i,
                                 num_segments=num_views)) * free

        deg = (jax.ops.segment_sum(w, edge_j, num_segments=num_views) +
               jax.ops.segment_sum(w, edge_i, num_segments=num_views))
        M_inv = (1.0 / jnp.maximum(deg, 1e-10))[:, None]

        # warm-started CG from the current c
        res = b - matvec(c)
        z = res * M_inv
        p = z
        rz = jnp.sum(res * z)

        def cg_body(k, st):
            x, res, p, rz = st
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
            x = x + alpha * p
            res = res - alpha * Ap
            z = res * M_inv
            rz_new = jnp.sum(res * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            p = z + beta * p
            return (x, res, p, rz_new)

        c_new, _, _, _ = jax.lax.fori_loop(0, opts.cg_iterations,
                                           cg_body, (c, res, p, rz))
        return c_new * free

    return jax.lax.fori_loop(0, opts.max_iterations, bcd_step,
                             init_pos * free)


def estimate_positions_nonlinear(orientations, edges, rel_positions,
                                 edge_weights=None,
                                 opts: PositionEstimatorOptions =
                                 PositionEstimatorOptions()):
    """Nonlinear (robust-LS) position estimation.

    orientations (V, 3) angle-axis world->camera; edges (E, 2) [i, j];
    rel_positions (E, 3): position of camera j in camera i's frame
    (TwoViewInfo.position_2, unit norm). Returns (V, 3) positions with
    c_0 = 0 and unit mean baseline.
    """
    from ...math import rotation as rot
    V = orientations.shape[0]
    E = edges.shape[0]
    # rotate relative direction into world frame: t_world = R_i^T t_ij
    R_i = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(orientations)))[edges[:, 0]]
    t_world = np.einsum("eji,ej->ei", R_i, np.asarray(rel_positions))
    t_world /= np.maximum(np.linalg.norm(t_world, axis=-1,
                                         keepdims=True), 1e-12)
    w = np.ones(E) if edge_weights is None else np.asarray(edge_weights)
    init = _random_init(V, edges, t_world, opts.seed)
    # warm start from the CONVEX LUD solve — avoids the folded local
    # minima of the chordal objective on loopy graphs
    init = _lud_bcd_sparse(init, np.asarray(edges), t_world, w,
                           iters=40)
    init /= max(np.mean(np.linalg.norm(
        init[edges[:, 1]] - init[edges[:, 0]], axis=-1)), 1e-10)
    out = _solve_positions(jnp.asarray(init),
                           jnp.asarray(edges[:, 0], jnp.int32),
                           jnp.asarray(edges[:, 1], jnp.int32),
                           jnp.asarray(t_world), jnp.asarray(w),
                           opts, V, "nonlinear")
    return np.asarray(out)


def _lud_bcd_sparse(init, edges, t_world, edge_w, iters: int = 60):
    """Host BCD for the convex LUD with a DIRECT sparse factorization
    per IRLS iteration — the reference's SparseCholeskyLLt pattern
    (least_unsquared_deviation_position_estimator.cc). Exact inner
    solves make the outer loop converge in tens of iterations even on
    ring graphs where Jacobi-CG crawls."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    V = init.shape[0]
    E = edges.shape[0]
    ei = edges[:, 0].astype(np.int64)
    ej = edges[:, 1].astype(np.int64)
    c = np.array(init, float)
    c -= c[0]
    rows = np.concatenate([ei, ej, ei, ej])
    cols = np.concatenate([ei, ej, ej, ei])
    # annealed IRLS smoothing: large eps early (avoids weight blowup
    # locking a premature fixed point), tightened geometrically
    eps = 0.1
    for _ in range(iters):
        base = c[ej] - c[ei]
        d = np.maximum(np.sum(base * t_world, axis=-1), 1.0)
        r = base - d[:, None] * t_world
        rn = np.linalg.norm(r, axis=-1)
        w = edge_w / np.maximum(rn, eps)
        eps = max(1e-2, eps * 0.95)
        # weighted graph Laplacian (same scalar pattern per coordinate)
        vals = np.concatenate([w, w, -w, -w])
        L = sp.csc_matrix((vals, (rows, cols)), shape=(V, V))
        target = d[:, None] * t_world * w[:, None]
        b = np.zeros((V, 3))
        np.add.at(b, ej, target)
        np.add.at(b, ei, -target)
        # pin c_0 = 0 (drop row/col 0)
        solve = spla.factorized(L[1:, 1:].tocsc() +
                                1e-12 * sp.eye(V - 1, format="csc"))
        for k in range(3):
            c[1:, k] = solve(b[1:, k])
        c[0] = 0.0
    return c


def estimate_positions_lud(orientations, edges, rel_positions,
                           edge_weights=None,
                           opts: PositionEstimatorOptions =
                           PositionEstimatorOptions()):
    """Least-unsquared-deviations position estimation — the CONVEX
    1DSfM formulation with per-edge scale variables d_e >= 1 (ref
    least_unsquared_deviation_position_estimator.cc). Solved by block
    coordinate descent with direct sparse factorizations (host); the
    device BCD (`_solve_positions_lud_convex`) remains for
    observation-sharded multi-chip scale."""
    from ...math import rotation as rot
    V = orientations.shape[0]
    E = edges.shape[0]
    R_i = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(orientations)))[edges[:, 0]]
    t_world = np.einsum("eji,ej->ei", R_i, np.asarray(rel_positions))
    t_world /= np.maximum(np.linalg.norm(t_world, axis=-1,
                                         keepdims=True), 1e-12)
    w = np.ones(E) if edge_weights is None else np.asarray(edge_weights)
    init = _random_init(V, edges, t_world, opts.seed)
    c = _lud_bcd_sparse(init, np.asarray(edges), t_world, w,
                        iters=min(opts.max_iterations, 80))
    # final chordal GN polish (the convex solve fixes the basin; the
    # direction-chordal refinement sharpens to sub-percent accuracy)
    c = c / max(np.mean(np.linalg.norm(
        c[edges[:, 1]] - c[edges[:, 0]], axis=-1)), 1e-10)
    out = _solve_positions(jnp.asarray(c),
                           jnp.asarray(edges[:, 0], jnp.int32),
                           jnp.asarray(edges[:, 1], jnp.int32),
                           jnp.asarray(t_world), jnp.asarray(w),
                           opts, V, "lud")
    return np.asarray(out)

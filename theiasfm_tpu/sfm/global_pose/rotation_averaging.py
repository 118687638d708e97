"""Global rotation averaging: MST init + robust L1/IRLS refinement.

ref: src/theia/sfm/global_pose_estimation/robust_rotation_estimator.{h,cc}
(Chatterjee-Govindu L1-IRLS: an ADMM L1 stage then IRLS with a robust
kernel over a sparse Cholesky solve) and
src/theia/sfm/view_graph/orientations_from_maximum_spanning_tree.{h,cc}.

TPU-native shape: the sparse linear system is never formed. Each outer
iteration computes per-edge so(3) discrepancies r_e = log(R_j^T R_ij R_i)
in one batched op, then solves the weighted normal equations
(A^T W A) x = A^T W r  matrix-free with CG, where A has +I/-I blocks per
edge — the matvec is two gathers and two segment_sums. The L1 stage is
IRLS with w = 1/max(||r||, eps) (same minimizer family as the
reference's ADMM L1), followed by IRLS with the Geman-McClure-style
weights the reference uses.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ...math.graph import minimum_spanning_tree


@dataclasses.dataclass(frozen=True)
class RobustRotationOptions:
    """ref: robust_rotation_estimator.h Options."""
    l1_iterations: int = 5
    irls_iterations: int = 10
    cg_iterations: int = 50
    sigma_degrees: float = 5.0  # IRLS kernel width


def orientations_from_mst(num_views: int, edges: np.ndarray,
                          rel_rotations: np.ndarray,
                          weights: np.ndarray,
                          root: int = 0) -> np.ndarray:
    """Initialize global orientations by chaining relative rotations over
    the maximum-weight spanning tree (ref
    orientations_from_maximum_spanning_tree.cc). edges (E, 2) [i, j] with
    R_j = R_ij R_i; rel_rotations (E, 3) angle-axis; weights (E,) higher
    = better. Returns (num_views, 3) angle-axis world->camera."""
    mst = minimum_spanning_tree(num_views, edges, -np.asarray(weights))
    adj = {}
    for e in mst:
        i, j = int(edges[e, 0]), int(edges[e, 1])
        adj.setdefault(i, []).append((j, e, False))
        adj.setdefault(j, []).append((i, e, True))
    R_rel = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(rel_rotations)))
    R = np.zeros((num_views, 3, 3))
    R[root] = np.eye(3)
    visited = {root}
    stack = [root]
    while stack:
        i = stack.pop()
        for (j, e, reverse) in adj.get(i, ()):
            if j in visited:
                continue
            visited.add(j)
            if reverse:
                R[j] = R_rel[e].T @ R[i]
            else:
                R[j] = R_rel[e] @ R[i]
            stack.append(j)
    return np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))


@partial(jax.jit, static_argnames=("opts", "num_views", "axis_name"))
def _rotation_averaging_device(orient_aa, edge_i, edge_j, rel_aa,
                               edge_mask, opts: RobustRotationOptions,
                               num_views: int, axis_name=None):
    """One fused device computation of the full L1 -> IRLS schedule.

    axis_name: when set, edges are SHARDED over that mesh axis (the
    caller runs this under shard_map with edge arrays split and the
    orientation state replicated); every edge->view reduction is
    psummed, so the per-CG-iteration collective payload is O(V*3)
    floats — independent of the edge count. That is the multi-chip
    layout for the view-graph stages (ref performance.rst:94-112 puts
    rotation averaging + positions as the #2/#3 global-SfM costs)."""
    dtype = orient_aa.dtype
    sigma = jnp.asarray(np.radians(opts.sigma_degrees), dtype)

    def _reduce(u):
        y = (jax.ops.segment_sum(u, edge_j, num_segments=num_views) -
             jax.ops.segment_sum(u, edge_i, num_segments=num_views))
        if axis_name is not None:
            y = jax.lax.psum(y, axis_name)
        return y

    def _reduce_sym(u):
        y = (jax.ops.segment_sum(u, edge_j, num_segments=num_views) +
             jax.ops.segment_sum(u, edge_i, num_segments=num_views))
        if axis_name is not None:
            y = jax.lax.psum(y, axis_name)
        return y

    def edge_residuals(aa):
        R = rot.angle_axis_to_rotation_matrix(aa)  # (V,3,3)
        R_i = R[edge_i]
        R_j = R[edge_j]
        R_rel = rot.angle_axis_to_rotation_matrix(rel_aa)
        E = jnp.einsum("eji,ejk,ekl->eil",
                       R_j, R_rel, R_i)  # R_j^T R_ij R_i
        return rot.rotation_matrix_to_angle_axis(E)  # (E,3)

    def solve_step(aa, weight_fn):
        r = edge_residuals(aa)
        w = weight_fn(r) * edge_mask
        # solve (A^T W A) x = A^T W r with A x = x_j - x_i, gauge x_0 = 0
        free = (jnp.arange(num_views) != 0)[:, None]

        def matvec(x):
            u = (x[edge_j] - x[edge_i]) * w[:, None]
            return _reduce(u) * free

        b = _reduce(r * w[:, None]) * free

        # Jacobi preconditioner: degree * weight sum per view
        deg = _reduce_sym(w)
        M_inv = 1.0 / jnp.maximum(deg, 1e-10)

        def cg_body(k, st):
            x, res, p, rz = st
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
            x = x + alpha * p
            res = res - alpha * Ap
            z = res * M_inv[:, None]
            rz_new = jnp.sum(res * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            p = z + beta * p
            return (x, res, p, rz_new)

        x0 = jnp.zeros_like(aa)
        z0 = b * M_inv[:, None]
        st = (x0, b, z0, jnp.sum(b * z0))
        x, _, _, _ = jax.lax.fori_loop(0, opts.cg_iterations, cg_body, st)
        # update: R_v <- R_v exp(x_v)
        return jax.vmap(rot.multiply_rotations)(aa, x)

    def l1_weight(r):
        n = jnp.linalg.norm(r, axis=-1)
        return 1.0 / jnp.maximum(n, 1e-5)

    def irls_weight(r):
        s2 = jnp.sum(r * r, axis=-1)
        return (sigma ** 2 / (s2 + sigma ** 2)) ** 2

    aa = orient_aa
    aa = jax.lax.fori_loop(0, opts.l1_iterations,
                           lambda _, a: solve_step(a, l1_weight), aa)
    aa = jax.lax.fori_loop(0, opts.irls_iterations,
                           lambda _, a: solve_step(a, irls_weight), aa)
    return aa


def robust_rotation_averaging(init_orientations: np.ndarray,
                              edges: np.ndarray,
                              rel_rotations: np.ndarray,
                              opts: RobustRotationOptions =
                              RobustRotationOptions()):
    """Refine global orientations from pairwise relative rotations.

    init_orientations (V, 3) angle-axis world->camera (e.g. from MST);
    edges (E, 2) int [i, j]; rel_rotations (E, 3) with R_j = R_ij R_i.
    Returns (V, 3) refined angle-axis.
    """
    V = init_orientations.shape[0]
    out = _rotation_averaging_device(
        jnp.asarray(init_orientations),
        jnp.asarray(edges[:, 0], jnp.int32),
        jnp.asarray(edges[:, 1], jnp.int32),
        jnp.asarray(rel_rotations),
        jnp.ones(edges.shape[0], jnp.asarray(init_orientations).dtype),
        opts, V)
    return np.asarray(out)

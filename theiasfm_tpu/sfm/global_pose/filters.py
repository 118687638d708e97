"""View-graph filters for the global pipeline.

ref: src/theia/sfm/filter_view_pairs_from_orientation.{h,cc} (drop
edges whose relative rotation disagrees with the global orientations)
and src/theia/sfm/filter_view_pairs_from_relative_translation.{h,cc}
(the 1DSfM filter: random 1-D projections + minimum-feedback-arc-set
orderings score each edge's consistency).

TPU-native shape: the orientation check is one batched rotation-error
computation; the 1DSfM projections are a single (E, P) matmul, with the
greedy MFAS orderings (inherently sequential, tiny) on host.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot


def filter_view_pairs_from_orientation(orientations: np.ndarray,
                                       edges: np.ndarray,
                                       rel_rotations: np.ndarray,
                                       max_degrees: float = 5.0):
    """Boolean keep-mask per edge (ref
    filter_view_pairs_from_orientation.cc: compare R_ij against
    R_j R_i^T)."""
    R = rot.angle_axis_to_rotation_matrix(jnp.asarray(orientations))
    R_i = R[edges[:, 0]]
    R_j = R[edges[:, 1]]
    R_rel = rot.angle_axis_to_rotation_matrix(jnp.asarray(rel_rotations))
    R_err = jnp.einsum("eij,ekj->eik", R_rel,
                       jnp.einsum("eij,ekj->eik", R_j, R_i))
    cos = jnp.clip((jnp.trace(R_err, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
    err_deg = jnp.degrees(jnp.arccos(cos))
    return np.asarray(err_deg < max_degrees)


@dataclasses.dataclass(frozen=True)
class RelativeTranslationFilterOptions:
    """ref: FilterViewPairsFromRelativeTranslationOptions."""
    num_iterations: int = 48
    translation_projection_tolerance: float = 0.08


def _mfas_order(n_nodes: int, arcs_i, arcs_j, arc_w) -> np.ndarray:
    """Greedy minimum-feedback-arc-set ordering (1DSfM's ORDER step):
    repeatedly emit the node maximizing (out - in) weight among
    remaining. Returns position-in-order per node. Uses the native C++
    kernel when available (utils/native.py)."""
    from ...utils.native import mfas_order_native
    native = mfas_order_native(n_nodes, arcs_i, arcs_j, arc_w)
    if native is not None:
        return native
    import collections
    out_w = collections.defaultdict(float)
    in_w = collections.defaultdict(float)
    out_adj = collections.defaultdict(list)
    in_adj = collections.defaultdict(list)
    for i, j, w in zip(arcs_i, arcs_j, arc_w):
        out_w[i] += w
        in_w[j] += w
        out_adj[i].append((j, w))
        in_adj[j].append((i, w))
    remaining = set(range(n_nodes))
    order = np.zeros(n_nodes, dtype=np.int64)
    pos = 0
    while remaining:
        # pick node with max (out - in); sources (in==0) first
        best, best_score = None, -np.inf
        for v in remaining:
            score = out_w[v] - in_w[v] + (1e12 if in_w[v] <= 1e-12 else 0)
            if score > best_score:
                best, best_score = v, score
        remaining.discard(best)
        order[best] = pos
        pos += 1
        for (j, w) in out_adj[best]:
            if j in remaining:
                in_w[j] -= w
        for (i, w) in in_adj[best]:
            if i in remaining:
                out_w[i] -= w
    return order


def filter_view_pairs_from_relative_translation(
        orientations: np.ndarray, edges: np.ndarray,
        rel_positions: np.ndarray,
        opts: RelativeTranslationFilterOptions =
        RelativeTranslationFilterOptions(),
        seed: int = 0):
    """1DSfM relative-translation filter. Returns keep-mask (E,) bool.

    Projects world-frame pairwise directions onto random 1-D axes; for
    each projection, a greedy MFAS ordering of views is computed and
    every edge inconsistent with the ordering accumulates its projected
    weight; edges with high accumulated inconsistency are dropped
    (ref filter_view_pairs_from_relative_translation.cc:279 runs the
    projections on a thread pool; here the projections are one matmul
    and orderings are tiny host loops).
    """
    rng = np.random.default_rng(seed)
    E = edges.shape[0]
    V = orientations.shape[0]
    R_i = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(orientations)))[edges[:, 0]]
    t_world = np.einsum("eji,ej->ei", R_i, np.asarray(rel_positions))
    t_world /= np.maximum(
        np.linalg.norm(t_world, axis=-1, keepdims=True), 1e-12)

    P = opts.num_iterations
    axes = rng.normal(size=(P, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    proj = np.asarray(jnp.einsum("ei,pi->ep", jnp.asarray(t_world),
                                 jnp.asarray(axes)))  # (E, P)

    bad_weight = np.zeros(E)
    total_weight = np.zeros(E)
    for p in range(P):
        w = proj[:, p]
        # arcs oriented along positive projection
        arcs_i = np.where(w >= 0, edges[:, 0], edges[:, 1])
        arcs_j = np.where(w >= 0, edges[:, 1], edges[:, 0])
        aw = np.abs(w)
        order = _mfas_order(V, arcs_i, arcs_j, aw)
        # edge consistent if order[i] < order[j]
        consistent = order[arcs_i] < order[arcs_j]
        bad_weight += np.where(consistent, 0.0, aw)
        total_weight += aw
    frac = bad_weight / np.maximum(total_weight, 1e-12)
    return frac < opts.translation_projection_tolerance

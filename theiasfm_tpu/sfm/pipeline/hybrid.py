"""Hybrid reconstruction: global rotation averaging + incremental
position/structure estimation.

ref: src/theia/sfm/hybrid_reconstruction_estimator.{h,cc}:55,100-175
(Sweeney's hybrid method): camera orientations come from robust global
rotation averaging (drift-free), positions and structure grow
incrementally using known-orientation localization — the
2-point position solver (ref sfm/pose/position_from_two_rays.h and
relative_pose_from_two_points_with_known_rotation.h family).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ...solvers import MinimalSolverSpec, RansacOptions, ransac
from ..global_pose import (RobustRotationOptions, orientations_from_mst,
                           robust_rotation_averaging,
                           filter_view_pairs_from_orientation)
from ..reconstruction import Reconstruction
from ..view_graph import ViewGraph
from .estimate_tracks import EstimateTracksOptions, estimate_all_tracks
from .filters import (set_outlier_tracks_to_unestimated,
                      set_underconstrained_as_unestimated)
from .incremental import IncrementalOptions, _order_initial_pairs, _run_ba
from .localize import LocalizeOptions
from ...utils.precision import geometry_precision

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class HybridOptions:
    rotation: RobustRotationOptions = RobustRotationOptions()
    rotation_filtering_max_difference_degrees: float = 10.0
    incremental: IncrementalOptions = IncrementalOptions()
    seed: int = 0


def position_from_rays_data_spec() -> MinimalSolverSpec:
    """Known-rotation 2-point position RANSAC estimator.

    Data: {"world": (N, 3), "image": (N, 2) normalized, "R": (N, 3, 3)
    the FIXED camera rotation replicated per row so the spec stays
    row-sampleable and the whole thing vmaps across views with
    different orientations}. Only position c is estimated: world ray
    direction d_i = R^T [x_i, 1]; c is the point minimizing distance to
    the two lines {X_i - s d_i}.
    ref: position_from_two_rays.h semantics.
    """
    def solve(d):
        R = d["R"][0]
        X = d["world"]                      # (2, 3)
        xh = jnp.concatenate([d["image"],
                              jnp.ones_like(d["image"][:, :1])], -1)
        dirs = xh @ R                       # R^T applied to rays, (2, 3)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        # least-squares point closest to both back-projected lines
        eye = jnp.eye(3, dtype=X.dtype)
        A_v = eye[None] - dirs[:, :, None] * dirs[:, None, :]
        b_v = jnp.einsum("vij,vj->vi", A_v, X)
        A = jnp.sum(A_v, axis=0) + 1e-9 * eye
        b = jnp.sum(b_v, axis=0)
        c = jnp.linalg.solve(A, b)
        return c[None], jnp.ones(1, bool)

    def residuals(c, d):
        R = d["R"][0]
        p_cam = (d["world"] - c) @ R.T
        z = p_cam[:, 2]
        bad = z < 1e-6
        proj = p_cam[:, :2] / jnp.where(bad, 1.0, z)[:, None]
        err = jnp.sum((proj - d["image"]) ** 2, axis=-1)
        return jnp.where(bad, 1e12, err)

    def refine(c, d, w):
        # weighted GN on position only (3 params)
        R = d["R"][0]

        def rvec(cc):
            p_cam = (d["world"] - cc) @ R.T
            z = jnp.maximum(p_cam[:, 2], 1e-6)
            proj = p_cam[:, :2] / z[:, None]
            return ((proj - d["image"]) * w[:, None]).reshape(-1)

        def step(_, cc):
            r = rvec(cc)
            J = jax.jacfwd(rvec)(cc)
            delta = jnp.linalg.solve(J.T @ J + 1e-10 * jnp.eye(3),
                                     J.T @ r)
            cc_new = cc - delta
            return jnp.where(jnp.sum(rvec(cc_new) ** 2) <
                             jnp.sum(r ** 2), cc_new, cc)

        return jax.lax.fori_loop(0, 6, step, c)

    return MinimalSolverSpec("position_from_rays", 2, 1, solve,
                             residuals, refine)


import functools


@functools.lru_cache(maxsize=None)
def _jitted_known_orientation_batch(num_hypotheses: int):
    """One vmapped known-rotation position RANSAC over (V, N) views."""
    spec = position_from_rays_data_spec()
    ropts = RansacOptions(error_thresh=1.0,
                          num_hypotheses=num_hypotheses)

    @jax.jit
    def run(keys, world, image, R, mask, thresh):
        def one(k, w, im, Rv, m, th):
            sspec = dataclasses.replace(
                spec,
                residuals=lambda c, d: spec.residuals(c, d) / th)
            data = {"world": w, "image": im,
                    "R": jnp.broadcast_to(Rv, (w.shape[0], 3, 3))}
            c, summary = ransac(k, sspec, data, ropts, data_mask=m)
            return c, summary.num_inliers

        return jax.vmap(one)(keys, world, image, R, mask, thresh)

    return run


@geometry_precision
def localize_views_known_orientation_batch(
        key, recon: Reconstruction, view_ids, opts: LocalizeOptions):
    """Known-orientation localization of MANY views in ONE dispatch
    (ref localize_view_to_reconstruction.h option
    assume_known_orientation; per-round batching replaces the
    reference's per-view calls). Returns {view_id: success}."""
    from ...utils import count_dispatch, next_bucket
    prepared = []
    for vid in view_ids:
        view = recon.views[vid]
        cam = view.camera
        world, image = [], []
        for t, feat in view.features.items():
            tr = recon.tracks.get(t)
            if tr is not None and tr.is_estimated:
                world.append(tr.xyz())
                image.append(feat)
        if len(world) < max(opts.min_num_inliers, 3):
            continue
        focal = cam.intrinsics[0]
        pp = cam.intrinsics[3:5]
        norm = (np.stack(image) - pp) / focal
        thresh = (opts.reprojection_error_threshold_pixels / focal) ** 2
        R = np.asarray(rot.angle_axis_to_rotation_matrix(
            jnp.asarray(cam.extrinsics[3:6])))
        prepared.append((vid, np.stack(world), norm, R, thresh))
    if not prepared:
        return {}

    V = len(prepared)
    N = next_bucket(max(len(w) for _, w, _, _, _ in prepared), 64)
    world = np.zeros((V, N, 3))
    world[..., 2] = 1.0
    image = np.zeros((V, N, 2))
    Rs = np.zeros((V, 3, 3))
    mask = np.zeros((V, N), bool)
    thresh = np.zeros(V)
    for i, (vid, w, im, R, th) in enumerate(prepared):
        n = len(w)
        world[i, :n] = w
        image[i, :n] = im
        Rs[i] = R
        mask[i, :n] = True
        thresh[i] = th

    keys = jax.random.split(key, V)
    count_dispatch("localize_known_orientation_batch")
    c, n_inl = _jitted_known_orientation_batch(opts.num_hypotheses)(
        keys, jnp.asarray(world), jnp.asarray(image), jnp.asarray(Rs),
        jnp.asarray(mask), jnp.asarray(thresh))
    c = np.asarray(c)
    n_inl = np.asarray(n_inl)

    results = {}
    for i, (vid, _, _, _, _) in enumerate(prepared):
        ok = int(n_inl[i]) >= opts.min_num_inliers
        results[vid] = ok
        if ok:
            recon.views[vid].camera.extrinsics[:3] = c[i]
            recon.views[vid].is_estimated = True
    return results


@geometry_precision
def hybrid_reconstruction(recon: Reconstruction, graph: ViewGraph,
                          opts: HybridOptions = HybridOptions()) -> Dict:
    """Run the hybrid pipeline. Mutates recon."""
    key = jax.random.PRNGKey(opts.seed)
    # 1. global rotations
    vids = graph.view_ids()
    if len(vids) < 3:
        return {"success": False, "reason": "graph too small"}
    vid_idx = {v: i for i, v in enumerate(vids)}
    edges, rel_rot, weights = [], [], []
    for (v1, v2), info in graph.edges().items():
        edges.append((vid_idx[v1], vid_idx[v2]))
        rel_rot.append(np.asarray(info.rotation_2, float))
        weights.append(float(info.num_verified_matches))
    edges = np.asarray(edges)
    rel_rot = np.asarray(rel_rot)
    weights = np.asarray(weights)
    init = orientations_from_mst(len(vids), edges, rel_rot, weights)
    orientations = robust_rotation_averaging(init, edges, rel_rot,
                                             opts.rotation)
    for v in vids:
        recon.views[v].camera.extrinsics[3:6] = orientations[vid_idx[v]]

    # 2. incremental positions with known orientations
    iopts = opts.incremental
    pairs = _order_initial_pairs(recon, graph, iopts)
    if not pairs:
        return {"success": False, "reason": "no initial pair"}
    v1, v2 = pairs[0]
    info = graph.edge(v1, v2)
    # place pair using the averaged rotations + pairwise translation
    R1 = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(recon.views[v1].camera.extrinsics[3:6])))
    recon.views[v1].camera.extrinsics[:3] = 0.0
    t_world = R1.T @ np.asarray(info.position_2, float)
    recon.views[v2].camera.extrinsics[:3] = t_world
    recon.views[v1].is_estimated = True
    recon.views[v2].is_estimated = True
    estimate_all_tracks(recon, iopts.tracks)
    _run_ba(recon, iopts)

    while True:
        candidates = []
        for v, view in recon.views.items():
            if view.is_estimated or not graph.has_view(v):
                continue
            n_vis = sum(1 for t in view.features
                        if t in recon.tracks and
                        recon.tracks[t].is_estimated)
            if n_vis >= 3:
                candidates.append((n_vis, v))
        if not candidates:
            break
        candidates.sort(reverse=True)
        key, k = jax.random.split(key)
        round_views = [v for _, v in
                       candidates[:iopts.localize_round_size]]
        results = localize_views_known_orientation_batch(
            k, recon, round_views, iopts.localize)
        if not any(results.values()):
            break
        estimate_all_tracks(recon, iopts.tracks)
        _run_ba(recon, iopts)
        set_outlier_tracks_to_unestimated(
            recon, iopts.max_reprojection_error_pixels,
            iopts.min_triangulation_angle_degrees)
        set_underconstrained_as_unestimated(recon)

    estimate_all_tracks(recon, iopts.tracks)
    _run_ba(recon, iopts, polish=True)
    set_outlier_tracks_to_unestimated(
        recon, iopts.max_reprojection_error_pixels,
        iopts.min_triangulation_angle_degrees)
    set_underconstrained_as_unestimated(recon)
    return {"success": True,
            "num_estimated_views": len(recon.estimated_views()),
            "num_estimated_tracks": len(recon.estimated_tracks())}

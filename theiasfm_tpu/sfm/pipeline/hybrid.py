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
from .incremental import IncrementalOptions, _choose_initial_pair, _run_ba
from .localize import LocalizeOptions
from ...utils.precision import geometry_precision

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class HybridOptions:
    rotation: RobustRotationOptions = RobustRotationOptions()
    rotation_filtering_max_difference_degrees: float = 10.0
    incremental: IncrementalOptions = IncrementalOptions()
    seed: int = 0


def position_from_rays_spec(orientation_aa) -> MinimalSolverSpec:
    """Known-rotation 2-point position RANSAC estimator.

    Data: {"world": (N, 3), "image": (N, 2) normalized}. The camera
    rotation R is FIXED (global rotation averaging); only position c is
    estimated: world ray direction d_i = R^T [x_i, 1]; c is the point
    minimizing distance to the two lines {X_i - s d_i}.
    ref: position_from_two_rays.h semantics.
    """
    R = rot.angle_axis_to_rotation_matrix(orientation_aa)

    def solve(d):
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
        p_cam = (d["world"] - c) @ R.T
        z = p_cam[:, 2]
        bad = z < 1e-6
        proj = p_cam[:, :2] / jnp.where(bad, 1.0, z)[:, None]
        err = jnp.sum((proj - d["image"]) ** 2, axis=-1)
        return jnp.where(bad, 1e12, err)

    def refine(c, d, w):
        # weighted GN on position only (3 params)
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


def localize_view_known_orientation(key, recon: Reconstruction,
                                    view_id: int,
                                    opts: LocalizeOptions) -> bool:
    """Known-orientation localization (ref
    localize_view_to_reconstruction.h option
    assume_known_orientation)."""
    view = recon.views[view_id]
    cam = view.camera
    world, image = [], []
    for t, feat in view.features.items():
        tr = recon.tracks.get(t)
        if tr is not None and tr.is_estimated:
            world.append(tr.xyz())
            image.append(feat)
    if len(world) < max(opts.min_num_inliers, 3):
        return False
    world = np.stack(world)
    image = np.stack(image)
    focal = cam.intrinsics[0]
    pp = cam.intrinsics[3:5]
    norm = (image - pp) / focal
    thresh = opts.reprojection_error_threshold_pixels / focal
    spec = position_from_rays_spec(jnp.asarray(cam.extrinsics[3:6]))
    ropts = RansacOptions(error_thresh=float(thresh) ** 2,
                          num_hypotheses=opts.num_hypotheses)
    c, summary = ransac(key, spec,
                        {"world": jnp.asarray(world),
                         "image": jnp.asarray(norm)}, ropts)
    if int(summary.num_inliers) < opts.min_num_inliers:
        return False
    cam.extrinsics[:3] = np.asarray(c)
    view.is_estimated = True
    return True


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
    pair = _choose_initial_pair(recon, graph, iopts)
    if pair is None:
        return {"success": False, "reason": "no initial pair"}
    v1, v2 = pair
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
        localized_any = False
        for _, v in candidates[:8]:
            key, k = jax.random.split(key)
            if localize_view_known_orientation(k, recon, v,
                                               iopts.localize):
                localized_any = True
                estimate_all_tracks(recon, iopts.tracks)
                _run_ba(recon, iopts)
                set_outlier_tracks_to_unestimated(
                    recon, iopts.max_reprojection_error_pixels,
                    iopts.min_triangulation_angle_degrees)
                set_underconstrained_as_unestimated(recon)
        if not localized_any:
            break

    estimate_all_tracks(recon, iopts.tracks)
    _run_ba(recon, iopts, polish=True)
    set_outlier_tracks_to_unestimated(
        recon, iopts.max_reprojection_error_pixels,
        iopts.min_triangulation_angle_degrees)
    set_underconstrained_as_unestimated(recon)
    return {"success": True,
            "num_estimated_views": len(recon.estimated_views()),
            "num_estimated_tracks": len(recon.estimated_tracks())}

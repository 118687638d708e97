"""Outlier and degeneracy filters on a reconstruction.

ref: src/theia/sfm/set_outlier_tracks_to_unestimated.{h,cc} (reprojection
error + triangulation angle gates) and
set_underconstrained_tracks_to_unestimated / ..._views (iterative
pruning of tracks with <2 estimated views and views with <2 estimated
tracks). The error computation is one batched device call via the
BAProblem snapshot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...camera import models as cm
from ..reconstruction import Reconstruction


import functools


@functools.lru_cache(maxsize=None)
def _jitted_angles(max_views: int):
    from .. import triangulation as tri

    @jax.jit
    def compute(origins, pts, mask):
        return tri.triangulation_angles(origins, pts, mask)

    return compute


@functools.lru_cache(maxsize=None)
def _jitted_reproj(model: int):
    @jax.jit
    def compute(prob):
        extr = prob.extrinsics[prob.obs_cam]
        intr = prob.intrinsics[prob.obs_group]
        pts = prob.points[prob.obs_pt]
        pix, depth = jax.vmap(
            lambda e, i, p: cm.project(model, e, i, p))(extr, intr, pts)
        err = jnp.linalg.norm(pix - prob.obs_pix, axis=-1)
        return jnp.where(depth > 0, err, jnp.inf)

    return compute


def _reprojection_errors(recon: Reconstruction):
    """Per-observation reprojection errors for estimated views+tracks.
    Returns (obs list [(vid, tid)], errors np.ndarray)."""
    prob, (vids, tids, groups, cam_group) = recon.to_ba_problem()
    if prob.obs_pix.shape[0] == 0:
        return [], np.zeros(0)
    model = recon.views[vids[0]].camera.model_type if vids else 0

    from ..ba.bundle_adjustment import pad_ba_problem
    M = prob.obs_pix.shape[0]
    errors = np.asarray(_jitted_reproj(int(model))(
        pad_ba_problem(prob)))[:M]
    # rebuild the same (vid, tid) order used by to_ba_problem
    obs = []
    tid_set = set(tids)
    for v in vids:
        for t in recon.views[v].features:
            if t in tid_set:
                obs.append((v, t))
    return obs, errors


def set_outlier_tracks_to_unestimated(
        recon: Reconstruction,
        max_reprojection_error_pixels: float = 5.0,
        min_triangulation_angle_degrees: float = 0.0) -> int:
    """Mark tracks with any large reprojection error (or too-small
    triangulation angle) as unestimated. Returns #tracks removed.
    ref: set_outlier_tracks_to_unestimated.cc."""
    obs, errors = _reprojection_errors(recon)
    bad_tracks = set()
    for (v, t), e in zip(obs, errors):
        if not np.isfinite(e) or e > max_reprojection_error_pixels:
            bad_tracks.add(t)

    if min_triangulation_angle_degrees > 0:
        # batched: all (track, observing-view-origin) sets in ONE padded
        # device call (the per-track host loop was the pipeline's
        # hottest spot on fountain11)
        from ...utils import next_bucket
        from .. import triangulation as tri
        cand = []
        for t in recon.estimated_tracks():
            if t in bad_tracks:
                continue
            tr = recon.tracks[t]
            est_views = [v for v in tr.views
                         if recon.views[v].is_estimated]
            if len(est_views) < 2:
                bad_tracks.add(t)
            else:
                cand.append((t, est_views))
        if cand:
            V = next_bucket(max(len(v) for _, v in cand), 2)
            T = next_bucket(len(cand), 8)
            origins = np.zeros((T, V, 3))
            vmask = np.zeros((T, V), bool)
            pts = np.zeros((T, 4))
            pts[:, 3] = 1.0
            pos_cache = {}
            for i, (t, views) in enumerate(cand):
                pts[i] = recon.tracks[t].point
                for j, v in enumerate(views[:V]):
                    if v not in pos_cache:
                        pos_cache[v] = recon.views[v].camera.position
                    origins[i, j] = pos_cache[v]
                    vmask[i, j] = True
            ang = np.asarray(_jitted_angles(V)(
                jnp.asarray(origins), jnp.asarray(pts),
                jnp.asarray(vmask)))
            for i, (t, _) in enumerate(cand):
                if ang[i] < min_triangulation_angle_degrees:
                    bad_tracks.add(t)

    for t in bad_tracks:
        recon.tracks[t].is_estimated = False
    return len(bad_tracks)


def set_underconstrained_as_unestimated(recon: Reconstruction) -> int:
    """Iteratively drop tracks with <2 estimated views and views with <2
    estimated tracks. ref: set_underconstrained_* (used at
    incremental_reconstruction_estimator.cc:273)."""
    n_removed = 0
    changed = True
    while changed:
        changed = False
        for t in recon.estimated_tracks():
            tr = recon.tracks[t]
            n_est = sum(1 for v in tr.views
                        if recon.views[v].is_estimated)
            if n_est < 2:
                tr.is_estimated = False
                n_removed += 1
                changed = True
        for v in recon.estimated_views():
            view = recon.views[v]
            n_est = sum(1 for t in view.features
                        if t in recon.tracks and
                        recon.tracks[t].is_estimated)
            if n_est < 2:
                view.is_estimated = False
                n_removed += 1
                changed = True
    return n_removed

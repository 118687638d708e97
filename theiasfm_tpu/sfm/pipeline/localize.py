"""Localize a view against the current reconstruction (2D-3D RANSAC).

ref: src/theia/sfm/localize_view_to_reconstruction.{h,cc} — collect
2D-3D matches from estimated tracks observed by the view, run P3P
RANSAC (calibrated path) with reprojection threshold, then single-view
refinement (the reference's BundleAdjustView; here the batched GN from
estimators/absolute_pose.py, applied inside the RANSAC refine step).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...solvers import RansacOptions
from ...utils import count_dispatch, next_bucket
from ..estimators import estimate_calibrated_absolute_pose
from ..reconstruction import Reconstruction
from ...utils.precision import geometry_precision


@dataclasses.dataclass(frozen=True)
class LocalizeOptions:
    """ref: localize_view_to_reconstruction.h:49-88."""
    reprojection_error_threshold_pixels: float = 4.0
    min_num_inliers: int = 30
    num_hypotheses: int = 256
    bundle_adjust_view: bool = True


@geometry_precision
def localize_view(key, recon: Reconstruction, view_id: int,
                  opts: LocalizeOptions) -> bool:
    """Attempt to localize `view_id`. On success sets camera pose and
    is_estimated; returns success."""
    view = recon.views[view_id]
    cam = view.camera
    world, image = [], []
    for t, feat in view.features.items():
        tr = recon.tracks.get(t)
        if tr is not None and tr.is_estimated:
            world.append(tr.xyz())
            image.append(feat)
    if len(world) < max(opts.min_num_inliers, 4):
        return False

    world = np.stack(world)
    image = np.stack(image)
    focal = cam.intrinsics[0]
    pp = cam.intrinsics[3:5]
    norm = (image - pp) / focal  # normalized coords (pinhole, no dist)
    thresh = opts.reprojection_error_threshold_pixels / focal

    ropts = RansacOptions(error_thresh=float(thresh) ** 2,
                          num_hypotheses=opts.num_hypotheses)
    count_dispatch("localize")
    out = estimate_calibrated_absolute_pose(
        key, jnp.asarray(world), jnp.asarray(norm), ropts)
    n_inl = int(out["num_inliers"])
    if n_inl < opts.min_num_inliers:
        return False
    cam.extrinsics = np.asarray(out["extrinsics"])
    view.is_estimated = True
    return True


@functools.lru_cache(maxsize=None)
def _jitted_localize_batch(num_hypotheses: int):
    """One vmapped P3P-RANSAC over a padded (V, N) batch of views.

    Per-view thresholds ride as a residual pre-scale so one compiled
    RansacOptions covers every view (same trick as
    twoview.estimate_twoview_info_batch)."""
    from ...solvers import ransac
    from ..estimators.absolute_pose import absolute_pose_spec

    spec = absolute_pose_spec()
    ropts = RansacOptions(error_thresh=1.0,
                          num_hypotheses=num_hypotheses)

    @jax.jit
    def run(keys, world, image, mask, thresh):
        def one(k, w, im, m, th):
            sspec = dataclasses.replace(
                spec,
                residuals=lambda e, d: spec.residuals(e, d) / th)
            extr, summary = ransac(k, sspec,
                                   {"world": w, "image": im}, ropts,
                                   data_mask=m)
            return extr, summary.num_inliers

        return jax.vmap(one)(keys, world, image, mask, thresh)

    return run


@geometry_precision
def localize_views_batch(key, recon: Reconstruction,
                         view_ids: List[int],
                         opts: LocalizeOptions) -> Dict[int, bool]:
    """Localize MANY candidate views in ONE device dispatch.

    The reference runs LocalizeViewToReconstruction once per candidate
    in the incremental loop (incremental_reconstruction_estimator.cc:222);
    on TPU a host loop of small RANSAC calls is dispatch-latency-bound,
    so all candidates' 2D-3D match sets pad into a (V, N) rectangle and
    one vmapped P3P-RANSAC localizes the whole round. On success sets
    camera pose + is_estimated; returns {view_id: success}.
    """
    prepared = []  # (vid, world (Ni,3), norm (Ni,2), thresh)
    for vid in view_ids:
        view = recon.views[vid]
        cam = view.camera
        world, image = [], []
        for t, feat in view.features.items():
            tr = recon.tracks.get(t)
            if tr is not None and tr.is_estimated:
                world.append(tr.xyz())
                image.append(feat)
        if len(world) < max(opts.min_num_inliers, 4):
            continue
        focal = cam.intrinsics[0]
        pp = cam.intrinsics[3:5]
        norm = (np.stack(image) - pp) / focal
        thresh = (opts.reprojection_error_threshold_pixels / focal) ** 2
        prepared.append((vid, np.stack(world), norm, thresh))
    if not prepared:
        return {}

    V = len(prepared)
    N = next_bucket(max(len(w) for _, w, _, _ in prepared), 64)
    world = np.zeros((V, N, 3))
    world[..., 2] = 1.0  # benign pad geometry (unit-depth points)
    image = np.zeros((V, N, 2))
    mask = np.zeros((V, N), bool)
    thresh = np.zeros(V)
    for i, (vid, w, im, th) in enumerate(prepared):
        n = len(w)
        world[i, :n] = w
        image[i, :n] = im
        mask[i, :n] = True
        thresh[i] = th

    keys = jax.random.split(key, V)
    count_dispatch("localize_batch")
    extr, n_inl = _jitted_localize_batch(opts.num_hypotheses)(
        keys, jnp.asarray(world), jnp.asarray(image),
        jnp.asarray(mask), jnp.asarray(thresh))
    extr = np.asarray(extr)
    n_inl = np.asarray(n_inl)

    results: Dict[int, bool] = {}
    for i, (vid, _, _, _) in enumerate(prepared):
        ok = int(n_inl[i]) >= opts.min_num_inliers
        results[vid] = ok
        if ok:
            recon.views[vid].camera.extrinsics = extr[i].astype(float)
            recon.views[vid].is_estimated = True
    return results

"""Localize a view against the current reconstruction (2D-3D RANSAC).

ref: src/theia/sfm/localize_view_to_reconstruction.{h,cc} — collect
2D-3D matches from estimated tracks observed by the view, run P3P
RANSAC (calibrated path) with reprojection threshold, then single-view
refinement (the reference's BundleAdjustView; here the batched GN from
estimators/absolute_pose.py, applied inside the RANSAC refine step).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ...solvers import RansacOptions
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
    out = estimate_calibrated_absolute_pose(
        key, jnp.asarray(world), jnp.asarray(norm), ropts)
    n_inl = int(out["num_inliers"])
    if n_inl < opts.min_num_inliers:
        return False
    cam.extrinsics = np.asarray(out["extrinsics"])
    view.is_estimated = True
    return True

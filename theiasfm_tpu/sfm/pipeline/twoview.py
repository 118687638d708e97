"""Two-view geometry estimation from correspondences.

ref: src/theia/sfm/estimate_twoview_info.{h,cc} — calibrated pairs use
5-pt essential RANSAC; uncalibrated use 8-pt fundamental with a
shared-focal prior; threshold is resolution-scaled. Returns a
TwoViewInfo (relative rotation/position) + inlier correspondences.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ...solvers import RansacOptions
from ..estimators import estimate_relative_pose
from ..view_graph import TwoViewInfo


@dataclasses.dataclass(frozen=True)
class TwoViewInfoOptions:
    """ref: estimate_twoview_info.h:51-73."""
    max_sampson_error_pixels: float = 2.25
    num_hypotheses: int = 256
    min_inliers: int = 30


def estimate_twoview_info(key, pix1, pix2, focal1, focal2, opts,
                          pp1=(0.0, 0.0), pp2=(0.0, 0.0)):
    """Calibrated two-view estimation.

    pix1/pix2: (N, 2) pixel coords; focals+principal points from priors
    (ref CalibratedEstimateTwoViewInfo path, estimate_twoview_info.cc:131+).
    Returns (TwoViewInfo, inlier_mask (N,) np.ndarray).
    """
    x1 = (pix1 - jnp.asarray(pp1)) / focal1
    x2 = (pix2 - jnp.asarray(pp2)) / focal2
    # resolution-scaled threshold in normalized units
    thresh = opts.max_sampson_error_pixels / np.sqrt(focal1 * focal2)
    ropts = RansacOptions(error_thresh=float(thresh) ** 2,
                          num_hypotheses=opts.num_hypotheses)
    out = estimate_relative_pose(key, x1, x2, ropts)
    info = TwoViewInfo(
        focal_length_1=float(focal1),
        focal_length_2=float(focal2),
        rotation_2=np.asarray(rot.rotation_matrix_to_angle_axis(out["R"])),
        # position of camera 2 in camera-1 frame: c2 = -R^T t
        position_2=np.asarray(-out["R"].T @ out["t"]),
        num_verified_matches=int(out["num_inliers"]),
    )
    return info, np.asarray(out["inliers"])

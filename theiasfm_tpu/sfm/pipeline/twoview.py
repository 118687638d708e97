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


import functools

import jax
from ...utils.precision import geometry_precision


@functools.lru_cache(maxsize=None)
def _jitted_twoview_batch(num_hypotheses: int):
    import dataclasses as _dc

    from ...solvers import ransac
    from ..estimators.twoview_estimators import _singleton_spec
    from ..pose.twoview_utils import relative_pose_from_essential

    spec = _singleton_spec("relative_pose")
    ropts = RansacOptions(error_thresh=1.0,  # residuals pre-scaled
                          num_hypotheses=num_hypotheses)

    @jax.jit
    def run(keys, x1, x2, mask, thresh):
        def one(k, a, b, m, th):
            sspec = _dc.replace(
                spec, residuals=lambda E, d: spec.residuals(E, d) / th)
            E, summary = ransac(k, sspec, {"x1": a, "x2": b}, ropts,
                                data_mask=m)
            R, t, _ = relative_pose_from_essential(
                E, a, b, mask=summary.inliers)
            return E, R, t, summary.inliers, summary.num_inliers

        return jax.vmap(one)(keys, x1, x2, mask, thresh)

    return run


@geometry_precision
def estimate_twoview_info_batch(key, pix1, pix2, mask, focal1, focal2,
                                pp1, pp2, opts: TwoViewInfoOptions):
    """Batched two-view estimation over P pairs in ONE device call.

    pix1/pix2 (P, N, 2) padded pixel correspondences; mask (P, N);
    focal/pp arrays (P,) / (P, 2). The per-pair RANSAC is vmapped —
    the throughput path for matching thousands of pairs (replaces the
    reference's thread-pool chunks, feature_matcher.cc:116-123).

    Returns (list of TwoViewInfo or None, inliers (P, N) np.ndarray).
    """
    P, N = pix1.shape[0], pix1.shape[1]
    f1 = jnp.asarray(focal1)[:, None, None]
    f2 = jnp.asarray(focal2)[:, None, None]
    x1 = (jnp.asarray(pix1) - jnp.asarray(pp1)[:, None, :]) / f1
    x2 = (jnp.asarray(pix2) - jnp.asarray(pp2)[:, None, :]) / f2
    thresh = (opts.max_sampson_error_pixels ** 2 /
              (jnp.asarray(focal1) * jnp.asarray(focal2)))

    keys = jax.random.split(key, P)
    E, R, t, inliers, n_inl = _jitted_twoview_batch(
        opts.num_hypotheses)(keys, x1, x2, jnp.asarray(mask), thresh)
    R = np.asarray(R)
    t = np.asarray(t)
    n_inl = np.asarray(n_inl)
    infos = []
    for p in range(P):
        if n_inl[p] < opts.min_inliers:
            infos.append(None)
            continue
        infos.append(TwoViewInfo(
            focal_length_1=float(np.asarray(focal1)[p]),
            focal_length_2=float(np.asarray(focal2)[p]),
            rotation_2=np.asarray(rot.rotation_matrix_to_angle_axis(
                jnp.asarray(R[p]))),
            position_2=-(R[p].T @ t[p]),
            num_verified_matches=int(n_inl[p])))
    return infos, np.asarray(inliers)


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

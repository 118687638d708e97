"""RANSAC estimators for two-view geometry.

ref: src/theia/sfm/estimators/estimate_relative_pose.cc (5-pt +
Sampson), estimate_fundamental_matrix.cc (8-pt), estimate_homography.cc
(4-pt). Each wires a minimal solver into the batched engine
(solvers/ransac.py) with the reference's residual choices, and a
nonminimal weighted refinement as the RefineModel equivalent.

Data layout: correspondences as a dict pytree
  {"x1": (N, 2), "x2": (N, 2)}
in NORMALIZED image coordinates for the calibrated solvers and pixel
coordinates for the uncalibrated ones.
"""
from __future__ import annotations

import jax.numpy as jnp

import jax

from ...math import rotation as rot
from ...solvers import MinimalSolverSpec, RansacOptions, ransac
from ..pose.eight_point import eight_point_fundamental, npoint_fundamental
from ..pose.five_point import five_point_essential
from ..pose.homography import (four_point_homography,
                               homography_transfer_error_sq,
                               npoint_homography)
from ..pose.twoview_utils import (relative_pose_from_essential,
                                  sampson_distance_sq)


def _project_to_essential(F):
    """Nearest essential matrix: singular values -> (1, 1, 0)."""
    U, s, Vt = jnp.linalg.svd(F)
    s_e = jnp.asarray([1.0, 1.0, 0.0], dtype=F.dtype)
    return (U * s_e[None, :]) @ Vt


def refine_relative_pose_gn(E, x1, x2, w, iters: int = 10):
    """Gauss-Newton on the (signed) first-order Sampson residual over an
    (angle-axis, translation) parameterization of the essential
    manifold — the batched replacement for the reference's
    BundleAdjustTwoViews angular refinement."""
    from ..pose.twoview_utils import (essential_from_rt,
                                      relative_pose_from_essential)
    R0, t0, _ = relative_pose_from_essential(E, x1, x2, mask=w > 0)
    aa0 = rot.rotation_matrix_to_angle_axis(R0)
    p0 = jnp.concatenate([aa0, t0])
    sw = jnp.sqrt(w)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)

    def residual_vec(p):
        R = rot.angle_axis_to_rotation_matrix(p[:3])
        t = p[3:6]
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        Em = rot.skew(t) @ R
        Ex1 = x1h @ Em.T
        Etx2 = x2h @ Em
        c = jnp.sum(x2h * Ex1, axis=-1)
        denom = jnp.sqrt(Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 +
                         Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2 + 1e-15)
        return sw * c / denom

    def step(_, p):
        r = residual_vec(p)
        J = jax.jacfwd(residual_vec)(p)
        JtJ = J.T @ J + 1e-10 * jnp.eye(6, dtype=p.dtype)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        p_new = p - delta
        better = jnp.sum(residual_vec(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p)

    p = jax.lax.fori_loop(0, iters, step, p0)
    R = rot.angle_axis_to_rotation_matrix(p[:3])
    t = p[3:6] / jnp.maximum(jnp.linalg.norm(p[3:6]), 1e-12)
    return essential_from_rt(R, t)


def relative_pose_spec() -> MinimalSolverSpec:
    """5-pt essential with Sampson residuals (normalized coords).
    ref: estimate_relative_pose.cc:62-83."""
    def solve(d):
        return five_point_essential(d["x1"], d["x2"])

    def residuals(E, d):
        return sampson_distance_sq(E, d["x1"], d["x2"])

    def refine(E, d, w):
        return refine_relative_pose_gn(E, d["x1"], d["x2"], w)

    return MinimalSolverSpec("relative_pose", 5, 10, solve, residuals,
                             refine)


def fundamental_spec() -> MinimalSolverSpec:
    """8-pt fundamental with Sampson residuals (pixel coords).
    ref: estimate_fundamental_matrix.cc."""
    def solve(d):
        return eight_point_fundamental(d["x1"], d["x2"])

    def residuals(F, d):
        return sampson_distance_sq(F, d["x1"], d["x2"])

    def refine(F, d, w):
        F_new, ok = npoint_fundamental(d["x1"], d["x2"], weights=w)
        return jnp.where(ok, F_new, F)

    return MinimalSolverSpec("fundamental", 8, 1, solve, residuals, refine)


def homography_spec() -> MinimalSolverSpec:
    """4-pt homography with forward transfer error.
    ref: estimate_homography.cc."""
    def solve(d):
        return four_point_homography(d["x1"], d["x2"])

    def residuals(H, d):
        return homography_transfer_error_sq(H, d["x1"], d["x2"])

    def refine(H, d, w):
        H_new, ok = npoint_homography(d["x1"], d["x2"], weights=w)
        return jnp.where(ok, H_new, H)

    return MinimalSolverSpec("homography", 4, 1, solve, residuals, refine)


import functools


@functools.lru_cache(maxsize=None)
def _singleton_spec(kind: str):
    return {"relative_pose": relative_pose_spec,
            "fundamental": fundamental_spec,
            "homography": homography_spec,
            "radial_homography":
                lambda: radial_distortion_homography_spec()}[kind]()


@functools.lru_cache(maxsize=None)
def _jitted_ransac(kind: str, options: RansacOptions):
    spec = _singleton_spec(kind)

    @jax.jit
    def run(key, data, mask):
        return ransac(key, spec, data, options, data_mask=mask)

    return run


def _pad_pair(x1, x2, mask):
    """Pad correspondences to a power-of-two bucket so repeated calls
    with ragged N hit the jit cache (padding discipline, utils/padding)."""
    from ...utils import next_bucket
    import numpy as np
    n = x1.shape[0]
    b = next_bucket(n, 64)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b == n:
        return x1, x2, mask
    pad = b - n
    x1 = jnp.concatenate([x1, jnp.zeros((pad, 2), x1.dtype)])
    x2 = jnp.concatenate([x2, jnp.zeros((pad, 2), x2.dtype)])
    mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    return x1, x2, mask


def estimate_relative_pose(key, x1, x2, options: RansacOptions, mask=None):
    """Full calibrated relative pose: RANSAC 5-pt -> (R, t) by cheirality.

    Returns dict(E, R, t, inliers, num_inliers, confidence). Inlier
    mask refers to the first N input correspondences.
    """
    n = x1.shape[0]
    x1p, x2p, maskp = _pad_pair(x1, x2, mask)
    E, summary = _jitted_ransac("relative_pose", options)(
        key, {"x1": x1p, "x2": x2p}, maskp)
    R, t, _ = relative_pose_from_essential(E, x1p, x2p,
                                           mask=summary.inliers)
    return {"E": E, "R": R, "t": t, "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}


def estimate_fundamental(key, x1, x2, options: RansacOptions, mask=None):
    n = x1.shape[0]
    x1p, x2p, maskp = _pad_pair(x1, x2, mask)
    F, summary = _jitted_ransac("fundamental", options)(
        key, {"x1": x1p, "x2": x2p}, maskp)
    return {"F": F, "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}


def estimate_homography(key, x1, x2, options: RansacOptions, mask=None):
    n = x1.shape[0]
    x1p, x2p, maskp = _pad_pair(x1, x2, mask)
    H, summary = _jitted_ransac("homography", options)(
        key, {"x1": x1p, "x2": x2p}, maskp)
    return {"H": H, "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}


def radial_distortion_homography_spec() -> MinimalSolverSpec:
    """6-pt two-sided radial-distortion homography (H6_l1l2) with the
    symmetric distorted-space transfer error.
    ref: estimate_radial_distortion_homography.cc."""
    from ..pose.radial_homography import (
        radial_homography_symmetric_error_sq,
        six_point_radial_distortion_homography)

    def solve(d):
        return six_point_radial_distortion_homography(d["x1"], d["x2"])

    def residuals(model, d):
        return radial_homography_symmetric_error_sq(model, d["x1"],
                                                    d["x2"])

    return MinimalSolverSpec("radial_homography", 6, 2, solve, residuals)


def estimate_radial_distortion_homography(key, x1, x2,
                                          options: RansacOptions,
                                          mask=None):
    """RANSAC radial homography between two division-model cameras.

    x1, x2 (N, 2) distorted NORMALIZED coordinates. Returns
    dict(H, l1, l2, inliers, num_inliers, confidence)
    (ref EstimateRadialHomographyMatrix,
    estimate_radial_distortion_homography.h)."""
    n = x1.shape[0]
    x1p, x2p, maskp = _pad_pair(x1, x2, mask)
    model, summary = _jitted_ransac("radial_homography", options)(
        key, {"x1": x1p, "x2": x2p}, maskp)
    return {"H": model["H"], "l1": model["l1"], "l2": model["l2"],
            "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}

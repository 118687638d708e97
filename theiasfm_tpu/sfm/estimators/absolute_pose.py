"""Calibrated absolute pose (P3P + RANSAC + Gauss-Newton refinement).

ref: src/theia/sfm/estimators/estimate_calibrated_absolute_pose.cc
(P3P minimal solver, squared reprojection residual in normalized
coords). The reference's RefineModel/DLS-PnP nonminimal step is
replaced by a batched fixed-iteration Gauss-Newton on the 6-parameter
extrinsics — the same role Ceres plays in BundleAdjustView, fused here.

Data layout: {"world": (N, 3), "image": (N, 2) normalized coords}.
Model: extrinsics (6,) = [position(3), angle-axis(3)].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...math import rotation as rot
from ...solvers import MinimalSolverSpec, RansacOptions, ransac
from ..pose.p3p import p3p_grunert


def _reproject_sq_error(extr, world, image):
    p_cam = rot.angle_axis_rotate_point(
        jnp.broadcast_to(extr[3:6], world.shape),
        world - extr[0:3])
    z = p_cam[..., 2]
    behind = z < 1e-6
    z_safe = jnp.where(behind, 1.0, z)
    proj = p_cam[..., :2] / z_safe[..., None]
    err = jnp.sum((proj - image) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


def refine_absolute_pose_gn(extr, world, image, weights, iters: int = 8,
                            damping: float = 1e-8):
    """Weighted Gauss-Newton on normalized reprojection error.

    Fixed iteration count + step acceptance keeps the shape static; the
    damping makes it LM-flavored for robustness far from the optimum.
    """
    def residual_vec(p):
        p_cam = rot.angle_axis_rotate_point(
            jnp.broadcast_to(p[3:6], world.shape), world - p[0:3])
        z = jnp.where(p_cam[..., 2] < 1e-6, 1e-6, p_cam[..., 2])
        proj = p_cam[..., :2] / z[..., None]
        return ((proj - image) * weights[..., None]).reshape(-1)

    def step(_, p):
        r = residual_vec(p)
        J = jax.jacfwd(residual_vec)(p)  # (2N, 6)
        JtJ = J.T @ J
        JtJ = JtJ + damping * jnp.diag(jnp.diag(JtJ)) + \
            1e-12 * jnp.eye(6, dtype=p.dtype)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        p_new = p - delta
        better = jnp.sum(residual_vec(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p)

    return jax.lax.fori_loop(0, iters, step, extr)


def absolute_pose_spec() -> MinimalSolverSpec:
    def solve(d):
        return p3p_grunert(d["world"], d["image"])

    def residuals(extr, d):
        return _reproject_sq_error(extr, d["world"], d["image"])

    def refine(extr, d, w):
        return refine_absolute_pose_gn(extr, d["world"], d["image"], w)

    return MinimalSolverSpec("calibrated_absolute_pose", 3, 4, solve,
                             residuals, refine)


import functools


@functools.lru_cache(maxsize=None)
def _jitted_abs_pose(options: RansacOptions):
    spec = absolute_pose_spec()

    @jax.jit
    def run(key, data, mask):
        return ransac(key, spec, data, options, data_mask=mask)

    return run


def estimate_calibrated_absolute_pose(key, world, image,
                                      options: RansacOptions, mask=None):
    """ref: estimate_calibrated_absolute_pose.h. Returns
    dict(extrinsics, inliers, num_inliers, confidence)."""
    from ...utils import next_bucket
    n = world.shape[0]
    b = next_bucket(n, 64)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        world = jnp.concatenate([world,
                                 jnp.zeros((pad, 3), world.dtype) +
                                 jnp.asarray([0.0, 0.0, 1.0])])
        image = jnp.concatenate([image, jnp.zeros((pad, 2), image.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    extr, summary = _jitted_abs_pose(options)(
        key, {"world": world, "image": image}, mask)
    return {"extrinsics": extr, "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}

"""Uncalibrated estimators: absolute pose with unknown focal (DLT PnP)
and relative pose with unknown focals (8-pt + Bougnoux).

ref: src/theia/sfm/estimators/estimate_uncalibrated_absolute_pose.cc
(P4Pf minimal; here a 6-pt DLT with the same model output:
extrinsics + focal) and estimate_uncalibrated_relative_pose.cc
(8-pt + focal extraction + decomposition).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...math import rotation as rot
from ...solvers import MinimalSolverSpec, RansacOptions, ransac
from ..pose.dlt_pnp import six_point_pnp
from ..pose.eight_point import eight_point_fundamental, npoint_fundamental
from ..pose.focal_from_fundamental import focal_lengths_from_fundamental
from ..pose.twoview_utils import sampson_distance_sq


def p4pf_spec() -> MinimalSolverSpec:
    """4-pt pose+focal minimal solver (ref P4Pf role,
    estimate_uncalibrated_absolute_pose.cc). Model: (10,) padded
    [extrinsics(6), focal, aspect=1, ppx=0, ppy=0]; data in
    principal-point-centered pixels."""
    from ..pose.p4pf import p4pf

    def solve(d):
        models, valid = p4pf(d["world"], d["image"])  # (4, 7)
        pad = jnp.zeros((models.shape[0], 3), models.dtype)
        pad = pad.at[:, 0].set(1.0)  # aspect
        out = jnp.concatenate(
            [models[:, :6], models[:, 6:7], pad], axis=-1)
        return out, valid

    def residuals(model, d):
        extr = model[:6]
        f = model[6]
        p_cam = rot.angle_axis_rotate_point(
            jnp.broadcast_to(extr[3:6], d["world"].shape),
            d["world"] - extr[0:3])
        z = p_cam[..., 2]
        bad = z < 1e-6
        zs = jnp.where(bad, 1.0, z)
        proj = p_cam[..., :2] / zs[..., None] * f
        err = jnp.sum((proj - d["image"]) ** 2, axis=-1)
        return jnp.where(bad, 1e12, err)

    def refine(model, d, w):
        from ..pose.dlt_pnp import decompose_projection_matrix, dlt_pnp
        P, ok = dlt_pnp(d["world"], d["image"], weights=w)
        K, extr = decompose_projection_matrix(P)
        new = jnp.concatenate([extr, jnp.stack(
            [K[0, 0], K[1, 1] / K[0, 0], K[0, 2], K[1, 2]])])
        good = ok & jnp.all(jnp.isfinite(new))
        return jnp.where(good, new, model)

    return MinimalSolverSpec("p4pf", 4, 4, solve, residuals, refine)


def uncalibrated_absolute_pose_spec() -> MinimalSolverSpec:
    """Model: (10,) [extrinsics(6), focal, aspect, ppx, ppy].
    Data: {"world": (N,3), "image": (N,2) pixels (pp-centered ok)}."""
    def solve(d):
        return six_point_pnp(d["world"], d["image"])

    def residuals(model, d):
        extr = model[:6]
        f, a, px, py = model[6], model[7], model[8], model[9]
        p_cam = rot.angle_axis_rotate_point(
            jnp.broadcast_to(extr[3:6], d["world"].shape),
            d["world"] - extr[0:3])
        z = p_cam[..., 2]
        bad = z < 1e-6
        zs = jnp.where(bad, 1.0, z)
        u = f * p_cam[..., 0] / zs + px
        v = f * a * p_cam[..., 1] / zs + py
        err = (u - d["image"][..., 0]) ** 2 + (v - d["image"][..., 1]) ** 2
        return jnp.where(bad, 1e12, err)

    def refine(model, d, w):
        from ..pose.dlt_pnp import (decompose_projection_matrix, dlt_pnp)
        P, ok = dlt_pnp(d["world"], d["image"], weights=w)
        K, extr = decompose_projection_matrix(P)
        new = jnp.concatenate([extr, jnp.stack(
            [K[0, 0], K[1, 1] / K[0, 0], K[0, 2], K[1, 2]])])
        good = ok & jnp.all(jnp.isfinite(new))
        return jnp.where(good, new, model)

    return MinimalSolverSpec("uncalibrated_absolute_pose", 6, 1, solve,
                             residuals, refine)


@functools.lru_cache(maxsize=None)
def _jitted_uncal_abs(options: RansacOptions, solver: str = "p4pf"):
    spec = (p4pf_spec() if solver == "p4pf"
            else uncalibrated_absolute_pose_spec())
    return jax.jit(lambda key, data, mask: ransac(
        key, spec, data, options, data_mask=mask))


def estimate_uncalibrated_absolute_pose(key, world, image,
                                        options: RansacOptions,
                                        mask=None):
    from ...utils import next_bucket
    n = world.shape[0]
    b = next_bucket(n, 64)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        world = jnp.concatenate([
            world, jnp.zeros((pad, 3), world.dtype) +
            jnp.asarray([0.0, 0.0, 1.0])])
        image = jnp.concatenate([image, jnp.zeros((pad, 2), image.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    model, summary = _jitted_uncal_abs(options)(
        key, {"world": world, "image": image}, mask)
    return {"extrinsics": model[:6], "focal_length": model[6],
            "intrinsics_tail": model[7:],
            "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}


def uncalibrated_relative_pose_spec() -> MinimalSolverSpec:
    """8-pt fundamental scored with Sampson (pixels); focal extraction
    happens after RANSAC. Data {"x1", "x2"} in principal-point-centered
    pixel coordinates."""
    def solve(d):
        return eight_point_fundamental(d["x1"], d["x2"])

    def residuals(F, d):
        return sampson_distance_sq(F, d["x1"], d["x2"])

    def refine(F, d, w):
        F_new, ok = npoint_fundamental(d["x1"], d["x2"], weights=w)
        return jnp.where(ok, F_new, F)

    return MinimalSolverSpec("uncalibrated_relative_pose", 8, 1, solve,
                             residuals, refine)


@functools.lru_cache(maxsize=None)
def _jitted_uncal_rel(options: RansacOptions):
    spec = uncalibrated_relative_pose_spec()
    return jax.jit(lambda key, data, mask: ransac(
        key, spec, data, options, data_mask=mask))


def estimate_uncalibrated_relative_pose(key, x1_centered, x2_centered,
                                        options: RansacOptions,
                                        mask=None):
    """x coordinates must be principal-point-centered pixels.
    Returns F, focal lengths (Bougnoux), and (R, t) from the implied
    essential matrix (ref estimate_uncalibrated_relative_pose.cc)."""
    from ...utils import next_bucket
    from ..pose.twoview_utils import relative_pose_from_essential
    n = x1_centered.shape[0]
    b = next_bucket(n, 64)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        x1_centered = jnp.concatenate(
            [x1_centered, jnp.zeros((pad, 2), x1_centered.dtype)])
        x2_centered = jnp.concatenate(
            [x2_centered, jnp.zeros((pad, 2), x2_centered.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    F, summary = _jitted_uncal_rel(options)(
        key, {"x1": x1_centered, "x2": x2_centered}, mask)
    zero = jnp.zeros(2, F.dtype)
    f1, f2, focal_valid = focal_lengths_from_fundamental(F, zero, zero)
    # E = K2^T F K1 (pp at origin)
    K1 = jnp.diag(jnp.stack([f1, f1, jnp.ones_like(f1)]))
    K2 = jnp.diag(jnp.stack([f2, f2, jnp.ones_like(f2)]))
    E = K2.T @ F @ K1
    x1n = x1_centered / f1
    x2n = x2_centered / f2
    R, t, _ = relative_pose_from_essential(E, x1n, x2n,
                                           mask=summary.inliers)
    return {"F": F, "focal_length_1": f1, "focal_length_2": f2,
            "focal_valid": focal_valid, "R": R, "t": t,
            "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers,
            "confidence": summary.confidence}

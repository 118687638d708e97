"""RANSAC estimators for 3D-3D transforms and robust triangulation.

ref: src/theia/sfm/estimators/estimate_rigid_transformation_2d_3d.cc,
estimate_similarity_transformation_2d_3d.cc (here the 3D-3D point
variants used by AlignReconstructions) and
estimate_triangulation.cc (RANSAC midpoint triangulation over ray
pairs with reprojection gating).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...solvers import MinimalSolverSpec, RansacOptions, ransac
from ..pose.p3p import rigid_align


def rigid_transform_spec(with_scale: bool = False) -> MinimalSolverSpec:
    """3-point rigid/similarity transform: dst ~ s R src + t.
    Model: (13,) [R.flatten(9), t(3), s(1)]."""
    def solve(d):
        src, dst = d["src"], d["dst"]
        if with_scale:
            mu_s = jnp.mean(src, 0)
            mu_d = jnp.mean(dst, 0)
            ns = jnp.linalg.norm(src - mu_s, axis=-1).mean()
            nd = jnp.linalg.norm(dst - mu_d, axis=-1).mean()
            s = nd / jnp.maximum(ns, 1e-12)
        else:
            s = jnp.ones((), src.dtype)
        R, t = rigid_align(src * s, dst)
        model = jnp.concatenate([R.reshape(9), t, s[None]])
        ok = jnp.all(jnp.isfinite(model))
        return model[None], ok[None]

    def residuals(model, d):
        R = model[:9].reshape(3, 3)
        t = model[9:12]
        s = model[12]
        pred = (d["src"] * s) @ R.T + t
        return jnp.sum((pred - d["dst"]) ** 2, axis=-1)

    def refine(model, d, w):
        src, dst = d["src"], d["dst"]
        if with_scale:
            sw = jnp.maximum(jnp.sum(w), 1e-12)
            mu_s = jnp.sum(src * w[:, None], 0) / sw
            mu_d = jnp.sum(dst * w[:, None], 0) / sw
            ns = jnp.sum(jnp.linalg.norm(src - mu_s, axis=-1) * w) / sw
            nd = jnp.sum(jnp.linalg.norm(dst - mu_d, axis=-1) * w) / sw
            s = nd / jnp.maximum(ns, 1e-12)
        else:
            s = jnp.ones((), src.dtype)
        R, t = rigid_align(src * s, dst, weights=w)
        new = jnp.concatenate([R.reshape(9), t, s[None]])
        return jnp.where(jnp.all(jnp.isfinite(new)), new, model)

    name = "similarity_transform" if with_scale else "rigid_transform"
    return MinimalSolverSpec(name, 3, 1, solve, residuals, refine)


@functools.lru_cache(maxsize=None)
def _jitted_transform(with_scale: bool, options: RansacOptions):
    spec = rigid_transform_spec(with_scale)
    return jax.jit(lambda key, data, mask: ransac(
        key, spec, data, options, data_mask=mask))


def estimate_rigid_transform(key, src, dst, options: RansacOptions,
                             with_scale: bool = False, mask=None):
    from ...utils import next_bucket
    n = src.shape[0]
    b = next_bucket(n, 16)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        src = jnp.concatenate([src, jnp.zeros((pad, 3), src.dtype)])
        dst = jnp.concatenate([dst, jnp.zeros((pad, 3), dst.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    model, summary = _jitted_transform(with_scale, options)(
        key, {"src": src, "dst": dst}, mask)
    return {"R": model[:9].reshape(3, 3), "t": model[9:12],
            "scale": model[12], "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers}


def triangulation_spec() -> MinimalSolverSpec:
    """Robust N-view triangulation: sample 2 observations -> midpoint;
    residual = angular error between observed and predicted rays.
    Data: {"origins": (N,3), "directions": (N,3) unit world rays}.
    ref: estimate_triangulation.cc."""
    def solve(d):
        o, r = d["origins"], d["directions"]
        eye = jnp.eye(3, dtype=o.dtype)
        A_v = eye[None] - r[:, :, None] * r[:, None, :]
        b_v = jnp.einsum("vij,vj->vi", A_v, o)
        A = jnp.sum(A_v, 0) + 1e-9 * eye
        X = jnp.linalg.solve(A, jnp.sum(b_v, 0))
        return X[None], jnp.ones(1, bool)

    def residuals(X, d):
        to_pt = X[None, :] - d["origins"]
        dist = jnp.linalg.norm(to_pt, axis=-1)
        to_pt = to_pt / jnp.maximum(dist[:, None], 1e-12)
        # squared chordal distance between rays; behind-origin rejected
        dot = jnp.sum(to_pt * d["directions"], axis=-1)
        err = 2.0 * (1.0 - dot)
        return jnp.where(dist < 1e-9, 1e12, err)

    def refine(X, d, w):
        o, r = d["origins"], d["directions"]
        eye = jnp.eye(3, dtype=o.dtype)
        A_v = (eye[None] - r[:, :, None] * r[:, None, :]) * \
            w[:, None, None]
        b_v = jnp.einsum("vij,vj->vi", A_v, o)
        A = jnp.sum(A_v, 0) + 1e-9 * eye
        X_new = jnp.linalg.solve(A, jnp.sum(b_v, 0))
        return jnp.where(jnp.all(jnp.isfinite(X_new)), X_new, X)

    return MinimalSolverSpec("triangulation", 2, 1, solve, residuals,
                             refine)


def plane_spec() -> MinimalSolverSpec:
    """3-point plane RANSAC (ref
    estimate_dominant_plane_from_points.cc). Model: (4,) [n(3), d] with
    n.x + d = 0, ||n|| = 1. Residual: squared point-plane distance."""
    def solve(d):
        p = d["points"]
        n = jnp.cross(p[1] - p[0], p[2] - p[0])
        norm = jnp.linalg.norm(n)
        ok = norm > 1e-12
        n = n / jnp.where(ok, norm, 1.0)
        off = -jnp.dot(n, p[0])
        return jnp.concatenate([n, off[None]])[None], ok[None]

    def residuals(model, d):
        return (d["points"] @ model[:3] + model[3]) ** 2

    def refine(model, d, w):
        # weighted total least squares plane: centroid + smallest
        # eigenvector of the weighted covariance
        p = d["points"]
        sw = jnp.maximum(jnp.sum(w), 1e-12)
        mu = jnp.sum(p * w[:, None], axis=0) / sw
        q = (p - mu) * jnp.sqrt(w)[:, None]
        C = q.T @ q
        _, V = jnp.linalg.eigh(C)
        n = V[:, 0]
        off = -jnp.dot(n, mu)
        new = jnp.concatenate([n, off[None]])
        return jnp.where(jnp.all(jnp.isfinite(new)), new, model)

    return MinimalSolverSpec("dominant_plane", 3, 1, solve, residuals,
                             refine)


@functools.lru_cache(maxsize=None)
def _jitted_plane(options: RansacOptions):
    spec = plane_spec()
    return jax.jit(lambda key, data, mask: ransac(
        key, spec, data, options, data_mask=mask))


def estimate_dominant_plane_from_points(key, points,
                                        options: RansacOptions,
                                        mask=None):
    from ...utils import next_bucket
    n = points.shape[0]
    b = next_bucket(n, 16)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        points = jnp.concatenate([points,
                                  jnp.zeros((pad, 3), points.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    model, summary = _jitted_plane(options)(
        key, {"points": points}, mask)
    return {"plane": model, "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers}


@functools.lru_cache(maxsize=None)
def _jitted_triangulation(options: RansacOptions):
    spec = triangulation_spec()
    return jax.jit(lambda key, data, mask: ransac(
        key, spec, data, options, data_mask=mask))


def estimate_triangulation(key, origins, directions,
                           options: RansacOptions, mask=None):
    from ...utils import next_bucket
    n = origins.shape[0]
    b = next_bucket(n, 8)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad, 3), origins.dtype)])
        directions = jnp.concatenate(
            [directions,
             jnp.zeros((pad, 3), directions.dtype).at[:, 2].set(1.0)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    X, summary = _jitted_triangulation(options)(
        key, {"origins": origins, "directions": directions}, mask)
    return {"point": X, "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers}


def similarity_transform_2d_3d_spec() -> MinimalSolverSpec:
    """4-point gDLS similarity transform from camera rays to 3D points
    (ref estimate_similarity_transformation_2d_3d.cc: RANSAC over
    CameraAndFeatureCorrespondence2D3D with gDLS as the minimal solver).

    Data: {"origin": (N, 3) ray origins, "dir": (N, 3) unit ray
    directions, "point": (N, 3) world points}. Model (13,)
    [R.flatten(9), t(3), s(1)] with R X + t - s o parallel to dir.
    Residual: squared angular distance (1 - cos) between the ray and
    the transformed point — the normalized-space analog of the
    reference's pixel reprojection threshold."""
    from ..pose.gdls import gdls_similarity_transform

    def solve(d):
        R, t, s, _ = gdls_similarity_transform(d["origin"], d["dir"],
                                               d["point"], gn_iters=10)
        model = jnp.concatenate([R.reshape(9), t, s[None]])
        ok = jnp.all(jnp.isfinite(model))
        return model[None], ok[None]

    def residuals(model, d):
        R = model[:9].reshape(3, 3)
        t = model[9:12]
        s = model[12]
        v = d["point"] @ R.T + t - s * d["origin"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-12)
        cos = jnp.sum(v * d["dir"], axis=-1)
        return 1.0 - cos

    return MinimalSolverSpec("similarity_2d_3d", 4, 1, solve, residuals)


@functools.lru_cache(maxsize=None)
def _jitted_sim_2d3d(options: RansacOptions):
    spec = similarity_transform_2d_3d_spec()
    return jax.jit(lambda key, data, mask: ransac(
        key, spec, data, options, data_mask=mask))


def estimate_similarity_transform_2d_3d(key, ray_origins, ray_dirs,
                                        points, options: RansacOptions,
                                        mask=None):
    """RANSAC gDLS: similarity aligning 3D points onto multi-camera
    rays. error_thresh is on (1 - cos angle). Returns
    dict(R, t, scale, inliers, num_inliers)."""
    from ...utils import next_bucket
    n = ray_origins.shape[0]
    b = next_bucket(n, 16)
    if mask is None:
        mask = jnp.ones(n, bool)
    if b != n:
        pad = b - n
        z = jnp.zeros((pad, 3), ray_origins.dtype)
        ray_origins = jnp.concatenate([ray_origins, z])
        ray_dirs = jnp.concatenate(
            [ray_dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]],
                                            ray_dirs.dtype), (pad, 1))])
        points = jnp.concatenate([points, z])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    model, summary = _jitted_sim_2d3d(options)(
        key, {"origin": ray_origins, "dir": ray_dirs, "point": points},
        mask)
    return {"R": model[:9].reshape(3, 3), "t": model[9:12],
            "scale": model[12], "inliers": summary.inliers[:n],
            "num_inliers": summary.num_inliers}

"""Similarity transforms and reconstruction alignment.

ref: src/theia/sfm/transformation/align_point_clouds.{h,cc} (Umeyama),
align_reconstructions.{h,cc} (robust similarity alignment of camera
positions), transform_reconstruction.cc.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..math import rotation as rot


def align_point_clouds(src, dst, with_scale: bool = True):
    """Umeyama least-squares similarity: dst ~ s R src + t.

    Returns (s, R (3,3), t (3,)). ref: AlignPointCloudsUmeyama.

    Host numpy in float64 on purpose: the inputs are tiny (a handful of
    camera positions), and on TPU the f32 default-precision matmul/SVD
    inject mm-scale error into the estimated transform — enough to
    corrupt benchmark evaluation (the reference's Eigen runs in double).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.array([1.0, 1.0, d])
    R = (U * D[None, :]) @ Vt
    var_s = np.mean(np.sum(sc * sc, axis=-1))
    s = float(np.sum(S * D) / max(var_s, 1e-15)) if with_scale else 1.0
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def align_reconstructions_robust(src_pos, dst_pos, n_trials: int = 200,
                                 inlier_thresh_factor: float = 3.0,
                                 seed: int = 0):
    """RANSAC-robust similarity alignment of matched camera positions
    (ref: AlignReconstructions, align_reconstructions.cc — robust to
    gross outliers in either reconstruction). Returns (s, R, t).
    """
    rng = np.random.default_rng(seed)
    src = np.asarray(src_pos)
    dst = np.asarray(dst_pos)
    n = len(src)
    if n < 3:
        return align_point_clouds(src, dst)
    best_inl, best = -1, None
    scale0 = np.median(np.linalg.norm(dst - np.median(dst, 0), axis=1))
    thresh = inlier_thresh_factor * max(scale0, 1e-9) * 0.1
    for _ in range(n_trials):
        idx = rng.choice(n, 3, replace=False)
        try:
            s, R, t = align_point_clouds(src[idx], dst[idx])
        except Exception:
            continue
        pred = s * src @ R.T + t
        err = np.linalg.norm(pred - dst, axis=1)
        inl = err < thresh
        if inl.sum() > best_inl:
            best_inl, best = inl.sum(), inl
    if best is None or best_inl < 3:
        return align_point_clouds(src, dst)
    s, R, t = align_point_clouds(src[best], dst[best])
    # final refit on inliers of the refit
    pred = s * src @ R.T + t
    err = np.linalg.norm(pred - dst, axis=1)
    inl = err < thresh
    if inl.sum() >= 3:
        s, R, t = align_point_clouds(src[inl], dst[inl])
    return s, R, t


def align_rotations(gt_rotations, rotations, iters: int = 20):
    """Find the single rotation R* minimizing
    sum_i || aa(R_i @ R*) - aa(gt_i) ||^2 and return the aligned
    rotations (angle-axis, (N, 3)).

    ref: src/theia/sfm/transformation/align_rotations.{h,cc} — the
    reference runs Ceres autodiff LM over the 3-parameter alignment;
    here it is a vmapped Gauss-Newton with jax.jacfwd on the identical
    residual, seeded by the chordal-L2 closed form (SVD of
    sum_i R_i^T gt_i).
    """
    import jax

    gt = jnp.asarray(gt_rotations, jnp.float64)
    aa = jnp.asarray(rotations, jnp.float64)
    R_un = rot.angle_axis_to_rotation_matrix(aa)
    R_gt = rot.angle_axis_to_rotation_matrix(gt)
    # closed-form chordal seed: argmax_R sum tr((R_un_i R)^T R_gt_i)
    M = jnp.einsum("nji,njk->ik", R_un, R_gt)
    U, _, Vt = jnp.linalg.svd(M)
    D = jnp.diag(jnp.asarray(
        [1.0, 1.0, jnp.sign(jnp.linalg.det(U @ Vt))]))
    x = rot.rotation_matrix_to_angle_axis(U @ D @ Vt)

    def residuals(x):
        R_align = rot.angle_axis_to_rotation_matrix(x)
        aligned = jnp.einsum("nij,jk->nik", R_un, R_align)
        return (rot.rotation_matrix_to_angle_axis(aligned) - gt).reshape(-1)

    def gn(_, x):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J + 1e-12 * jnp.eye(3)
        return x - jnp.linalg.solve(H, J.T @ r)

    x = jax.lax.fori_loop(0, iters, gn, x)
    R_align = rot.angle_axis_to_rotation_matrix(x)
    aligned = jnp.einsum("nij,jk->nik", R_un, R_align)
    return np.asarray(rot.rotation_matrix_to_angle_axis(aligned))


def transform_reconstruction(recon, s: float, R: np.ndarray,
                             t: np.ndarray):
    """Apply dst = s R src + t to all cameras and points in place.
    ref: TransformReconstruction."""
    R = np.asarray(R)
    for v in recon.views.values():
        if not v.is_estimated:
            continue
        c = v.camera.extrinsics[:3]
        aa = v.camera.extrinsics[3:6]
        v.camera.extrinsics[:3] = s * R @ c + t
        R_cam = np.asarray(
            rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
        R_new = R_cam @ R.T
        v.camera.extrinsics[3:6] = np.asarray(
            rot.rotation_matrix_to_angle_axis(jnp.asarray(R_new)))
    for tr in recon.tracks.values():
        if tr.is_estimated:
            xyz = tr.xyz()
            tr.point = np.append(s * R @ xyz + t, 1.0)

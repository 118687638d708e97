"""EPnP: closed-form O(N) perspective-n-point.

ref role: src/theia/sfm/pose/dls_pnp.{h,cc} and upnp.{h,cc} — the
reference's nonminimal PnP solvers. EPnP (Lepetit et al., IJCV 2009)
fills the same role with TPU-friendly math: 4 control points via PCA,
barycentric coordinates, a 12-dim nullspace from eigh of M^T M, the
beta cases solved in closed form, then rigid alignment — no iterative
elimination. Followed by the GN polish from estimators/absolute_pose
for DLS-level accuracy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...math import rotation as rot
from .p3p import rigid_align


def epnp(world, image, weights=None):
    """world (N, 3); image (N, 2) normalized coords. N >= 6.

    Returns (extrinsics (6,) [position, angle-axis], ok ()).
    """
    N = world.shape[0]
    dtype = world.dtype
    w = jnp.ones(N, dtype) if weights is None else weights
    sw = jnp.maximum(jnp.sum(w), 1e-12)

    # control points: centroid + principal axes (weighted PCA)
    c0 = jnp.sum(world * w[:, None], axis=0) / sw
    centered = (world - c0) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / sw
    eigval, eigvec = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-12))
    ctrl = jnp.concatenate([
        c0[None], c0[None] + (eigvec * scale[None, :]).T], axis=0)  # (4,3)

    # barycentric coordinates: world = alphas @ ctrl, sum(alpha) = 1
    A = jnp.concatenate([ctrl.T, jnp.ones((1, 4), dtype)], axis=0)  # (4,4)
    b = jnp.concatenate([world.T, jnp.ones((1, N), dtype)], axis=0)
    alphas = jnp.linalg.solve(A, b).T                                # (N,4)

    # M matrix: each obs gives 2 rows over the 12 control-point coords
    u, v = image[:, 0], image[:, 1]
    zero = jnp.zeros_like(alphas)
    rows_u = jnp.concatenate([
        alphas, zero, -u[:, None] * alphas], axis=1)   # (N, 12)
    rows_v = jnp.concatenate([
        zero, alphas, -v[:, None] * alphas], axis=1)
    M = jnp.concatenate([rows_u * jnp.sqrt(w)[:, None],
                         rows_v * jnp.sqrt(w)[:, None]])  # (2N, 12)
    # layout: [x coords of 4 ctrl pts in cam frame, y coords, z coords]
    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    # beta case 1: camera ctrl points = beta * v0 (scale from distance
    # preservation)
    v0 = V[:, 0]
    cc = jnp.stack([v0[0:4], v0[4:8], v0[8:12]], axis=1)  # (4, 3) cam

    # solve scale beta by matching pairwise control-point distances
    def pair_d(P):
        idx_a = jnp.asarray([0, 0, 0, 1, 1, 2])
        idx_b = jnp.asarray([1, 2, 3, 2, 3, 3])
        return jnp.linalg.norm(P[idx_a] - P[idx_b], axis=-1)

    d_w = pair_d(ctrl)
    d_c = pair_d(cc)
    beta = jnp.sum(d_w * d_c) / jnp.maximum(jnp.sum(d_c * d_c), 1e-15)
    cc = cc * beta
    # enforce positive depth of the point cloud
    pts_cam = alphas @ cc
    flip = jnp.where(jnp.sum(pts_cam[:, 2] * w) < 0, -1.0, 1.0)
    cc = cc * flip

    # rigid transform world ctrl -> camera ctrl
    R, t = rigid_align(ctrl[None], (cc)[None])
    R, t = R[0], t[0]
    aa = rot.rotation_matrix_to_angle_axis(R)
    pos = -R.T @ t
    extr = jnp.concatenate([pos, aa])
    ok = jnp.all(jnp.isfinite(extr))
    return extr, ok

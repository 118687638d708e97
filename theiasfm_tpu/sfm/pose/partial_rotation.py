"""Partial-rotation (gravity-aware) minimal pose solvers.

TPU-native equivalents of the reference's "known vertical / known axis"
solver family (Sweeney et al., ISMAR 2015 & CVPR 2015):

- ``two_point_pose_partial_rotation``
  ref: src/theia/sfm/pose/two_point_pose_partial_rotation.{h,cc}
- ``three_point_relative_pose_partial_rotation``
  ref: src/theia/sfm/pose/three_point_relative_pose_partial_rotation.{h,cc}
- ``four_point_relative_pose_partial_rotation`` (generalized cameras)
  ref: src/theia/sfm/pose/four_point_relative_pose_partial_rotation.{h,cc}
- ``sim_transform_partial_rotation`` (similarity, generalized cameras)
  ref: src/theia/sfm/pose/sim_transform_partial_rotation.{h,cc}

All share the same structure: parameterize the rotation about the known
axis ``v`` (unit) by the unnormalized-quaternion scalar ``s`` so that

    R(s) ~ s^2 I + 2 s [v]x + (2 v v^T - I)        (valid up to scale)

which turns each (generalized) epipolar constraint row into a quadratic
in ``s`` — a quadratic eigenvalue problem  (s^2 M + s C + K) x = 0.

The reference linearizes the QEP to a 2n x 2n matrix and calls LAPACK's
nonsymmetric eigensolver. That is unavailable on TPU, so instead we:

1. build the same linearization A = [[-M^-1 C, -M^-1 K], [I, 0]],
2. take its characteristic polynomial with the Faddeev-LeVerrier
   recurrence (pure matmuls -> MXU),
3. find all roots at once with the batched Aberth iteration,
4. recover each eigenvector as the smallest eigenvector of
   Q(s)^T Q(s) via `eigh` (symmetric eig IS supported on TPU).

Everything is fixed-shape and vmappable, so the solvers drop directly
into the batched RANSAC engine. Solutions are returned as fixed-size
arrays with a validity mask (invalid slots are garbage — mask them).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...math import polynomial as poly
from ...math import rotation as rot

__all__ = [
    "two_point_pose_partial_rotation",
    "three_point_relative_pose_partial_rotation",
    "four_point_relative_pose_partial_rotation",
    "sim_transform_partial_rotation",
]


def _unit_axis(axis):
    """The math assumes |axis| = 1 (the reference CHECKs this,
    e.g. two_point_pose_partial_rotation.cc:179); normalizing here is
    the branchless equivalent."""
    axis = jnp.asarray(axis)
    return axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)


def _rot_about_axis_from_s(axis, s):
    """R from the unnormalized quaternion (s, axis), axis unit, s (...)."""
    s = jnp.asarray(s)
    q = jnp.concatenate(
        [s[..., None], jnp.broadcast_to(axis, s.shape + (3,))], axis=-1)
    return rot.quaternion_to_rotation_matrix(q)  # normalizes internally


def _solve_qep(M, C, K, root_iters: int = 100):
    """Solve (s^2 M + s C + K) x = 0 for an (n, n) QEP.

    Returns (s (2n,), x (2n, n) unit rows, real_mask (2n,), m_ok ()).
    ``m_ok`` is False when M is numerically singular (the zero-rotation
    degenerate case in the reference, which falls back to null(M)).
    """
    n = M.shape[-1]
    detM = jnp.linalg.det(M)
    scale = jnp.maximum(jnp.max(jnp.abs(M)), 1e-30)
    m_ok = jnp.abs(detM) > 1e-12 * scale**n
    M_safe = jnp.where(m_ok, 1.0, 0.0) * M + \
        jnp.where(m_ok, 0.0, 1.0) * jnp.eye(n, dtype=M.dtype)
    Minv = jnp.linalg.inv(M_safe)
    A = jnp.zeros((2 * n, 2 * n), M.dtype)
    A = A.at[:n, :n].set(-Minv @ C)
    A = A.at[:n, n:].set(-Minv @ K)
    A = A.at[n:, :n].set(jnp.eye(n, dtype=M.dtype))
    cp = poly.char_poly(A)
    roots = poly.poly_roots(cp, iters=root_iters)
    real_mask = poly.real_roots_mask(roots, rel_tol=1e-4, abs_tol=1e-7)
    s = jnp.real(roots)  # (2n,)

    def null_vec(si):
        Q = si * si * M + si * C + K
        _, vecs = jnp.linalg.eigh(Q.T @ Q)
        return vecs[:, 0]

    x = jax.vmap(null_vec)(s)  # (2n, n)
    return s, x, real_mask, m_ok


def two_point_pose_partial_rotation(axis, model_points, image_rays):
    """Absolute pose with known rotation axis from 2 3D-point/ray pairs.

    Solves image_point = R(angle about `axis`) * model_point + t.
    model_points (2, 3); image_rays (2, 3) unit norm. Returns
    (R (2, 3, 3), t (2, 3), valid (2,)) — at most 2 solutions.

    ref: src/theia/sfm/pose/two_point_pose_partial_rotation.cc:90-151
    (ray-length quadratic), :54-89 (angle recovery in the axis-orthogonal
    plane). The reference swaps the points when ray1 is orthogonal to the
    axis (divide-by-zero guard); we always pick the better-conditioned
    ordering, branchlessly.
    """
    axis = _unit_axis(axis)
    mp = jnp.asarray(model_points)
    ir = jnp.asarray(image_rays)
    # Pick ordering so |ray_a . axis| is maximal (conditioning).
    dots = jnp.abs(ir @ axis)
    swap = dots[0] < dots[1]
    mp = jnp.where(swap, mp[::-1], mp)
    ir = jnp.where(swap, ir[::-1], ir)

    r1, r2 = ir[0], ir[1]
    p1, p2 = mp[0], mp[1]
    r1_ax = jnp.dot(r1, axis)
    feasible = jnp.abs(r1_ax) > 1e-9
    safe = jnp.where(feasible, r1_ax, 1.0)
    # Projections along the axis are rotation-invariant:
    #   y*(r1.axis) - x*(r2.axis) = (p1 - p2).axis  =>  x = m + n*y
    m = jnp.dot(p1 - p2, axis) / safe
    n_ = jnp.dot(r2, axis) / safe
    # Rigid distance preservation |y r1 - x r2| = |p1 - p2| gives a
    # quadratic a y^2 + b y + c = 0.
    rdp = jnp.dot(r1, r2)
    a = n_ * (n_ - 2.0 * rdp) + 1.0
    b = 2.0 * m * (n_ - rdp)
    c = m * m - jnp.dot(p1 - p2, p1 - p2)
    roots = poly.solve_quadratic(a, b, c)  # (2,) complex
    real = jnp.abs(jnp.imag(roots)) <= 1e-9 * (1.0 + jnp.abs(jnp.real(roots)))
    y = jnp.real(roots)                      # length along r1... careful:
    # in the derivation x multiplies r2 and y multiplies r1; the quadratic
    # above is in the r2-length (matching the reference where roots are the
    # length of image_ray_2 and `m + n*root` is the length of image_ray_1).
    len2 = y
    len1 = m + n_ * len2
    valid = real & (len1 > 0) & (len2 > 0) & feasible

    def one(l1, l2):
        q1 = l1 * r1
        q2 = l2 * r2
        dq = q1 - q2
        dp = p1 - p2
        # angle about the axis aligning the in-plane component of dp to dq
        b2 = jnp.cross(axis, dp)
        b2 = b2 / jnp.maximum(jnp.linalg.norm(b2), 1e-30)
        b1 = jnp.cross(b2, axis)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-30)
        angle = jnp.arctan2(jnp.dot(b2, dq), jnp.dot(b1, dq))
        R = rot.angle_axis_to_rotation_matrix(angle * axis)
        t = q1 - R @ p1
        return R, t

    R, t = jax.vmap(one)(len1, len2)
    return R, t, valid


def three_point_relative_pose_partial_rotation(axis, rays1, rays2):
    """Relative pose (R about `axis`, unit t) from 3 ray correspondences
    with ray2 ~ R * ray1 + t (epipolar sense).

    rays1/rays2 (3, 3). Returns (R (14, 3, 3), t (14, 3) unit,
    valid (14,)): 6 QEP roots x (+-t), plus 2 zero-rotation fallback
    slots used when the QEP is degenerate.

    ref: src/theia/sfm/pose/three_point_relative_pose_partial_rotation.cc:146-259.
    """
    axis = _unit_axis(axis)
    q1 = jnp.asarray(rays1)
    q2 = jnp.asarray(rays2)
    # Constraint rows: t . (q2 x R(s) q1) = 0 with the quadratic R(s).
    M = jnp.cross(q2, q1)                                   # s^2 terms
    C = 2.0 * jnp.cross(q2, jnp.cross(jnp.broadcast_to(axis, (3, 3)), q1))
    K = (2.0 * (q1 @ axis)[:, None] *
         jnp.cross(q2, jnp.broadcast_to(axis, (3, 3))) - jnp.cross(q2, q1))

    s, x, real_mask, m_ok = _solve_qep(M, C, K)
    R = _rot_about_axis_from_s(axis, s)                      # (6, 3, 3)
    t = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    qep_valid = real_mask & m_ok

    # Zero-rotation fallback: null vector of M (both signs).
    _, vecs = jnp.linalg.eigh(M.T @ M)
    t0 = vecs[:, 0]
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (2, 3, 3))

    R_all = jnp.concatenate([R, R, eyeR], axis=0)            # (14, 3, 3)
    t_all = jnp.concatenate([t, -t, jnp.stack([t0, -t0])], axis=0)
    valid = jnp.concatenate(
        [qep_valid, qep_valid, jnp.stack([~m_ok, ~m_ok])], axis=0)
    return R_all, t_all, valid


def _plucker_qep(axis, dirs1, origins1, dirs2, origins2):
    """Rows of the generalized epipolar constraint as quadratics in s.

    Rays are (origin, direction) in each camera frame; moments
    p = origin x direction (Plucker). Returns per-row coefficient
    matrices (M, C, K) each (n, 4):
    [-(q2 x R q1), q2 . R p1 + q1 . R^T p2] expanded in s.
    """
    q1, q2 = dirs1, dirs2
    p1 = jnp.cross(origins1, dirs1)
    p2 = jnp.cross(origins2, dirs2)
    n = q1.shape[0]
    ax = jnp.broadcast_to(axis, (n, 3))

    M3 = -jnp.cross(q2, q1)
    M4 = jnp.sum(q2 * p1, -1) + jnp.sum(q1 * p2, -1)
    C3 = -2.0 * jnp.cross(q2, jnp.cross(ax, q1))
    C4 = -2.0 * (jnp.sum(q1 * jnp.cross(ax, p2), -1)
                 - jnp.sum(q2 * jnp.cross(ax, p1), -1))
    K3 = -(2.0 * jnp.sum(q1 * ax, -1)[:, None] * jnp.cross(q2, ax)
           - jnp.cross(q2, q1))
    K4 = (-jnp.sum(q2 * p1, -1) - jnp.sum(q1 * p2, -1)
          + 2.0 * (jnp.sum(q2 * ax, -1) * jnp.sum(p1 * ax, -1)
                   + jnp.sum(q1 * ax, -1) * jnp.sum(p2 * ax, -1)))
    M = jnp.concatenate([M3, M4[:, None]], -1)
    C = jnp.concatenate([C3, C4[:, None]], -1)
    K = jnp.concatenate([K3, K4[:, None]], -1)
    return M, C, K


def four_point_relative_pose_partial_rotation(
        axis, dirs1, origins1, dirs2, origins2):
    """Relative pose (R about `axis`, metric t) between two generalized
    cameras from 4 ray correspondences (directions + origins per frame).

    Returns (R (8, 3, 3), t (8, 3), valid (8,)).

    ref: src/theia/sfm/pose/four_point_relative_pose_partial_rotation.cc:144-259
    (generalized epipolar constraint in Plucker coordinates; metric
    translation from the homogeneous QEP eigenvector).
    """
    axis = _unit_axis(axis)
    M, C, K = _plucker_qep(axis, jnp.asarray(dirs1), jnp.asarray(origins1),
                           jnp.asarray(dirs2), jnp.asarray(origins2))
    s, x, real_mask, m_ok = _solve_qep(M, C, K)
    R = _rot_about_axis_from_s(axis, s)
    w = x[:, 3]
    w_ok = jnp.abs(w) > 1e-7
    t = x[:, :3] / jnp.where(w_ok, w, 1.0)[:, None]
    return R, t, real_mask & m_ok & w_ok


def sim_transform_partial_rotation(axis, dirs1, origins1, dirs2, origins2):
    """Similarity transform (R about `axis`, t, scale) between two
    generalized cameras from 5 ray correspondences, such that rays of
    camera two, mapped by X = scale * R * X2 + t, intersect the
    corresponding rays of camera one.

    Returns (R (12, 3, 3), t (12, 3), scale (12,), valid (12,)):
    10 QEP slots + 2 zero-rotation fallback slots.

    ref: src/theia/sfm/pose/sim_transform_partial_rotation.cc:139-283
    (scale enters as an extra homogeneous column; solutions with
    non-positive scale are rejected).
    """
    axis = _unit_axis(axis)
    f1 = jnp.asarray(dirs1)
    f2 = jnp.asarray(dirs2)
    o1 = jnp.asarray(origins1)
    o2 = jnp.asarray(origins2)
    n = f1.shape[0]

    eye = jnp.eye(3, dtype=f1.dtype)
    rot_s2 = eye
    rot_s1 = 2.0 * rot.skew(axis)
    rot_c = 2.0 * jnp.outer(axis, axis) - eye

    def rows(Rpart):
        Rf2 = f2 @ Rpart.T                                  # (n, 3)
        c3 = jnp.cross(f1, Rf2)
        c4 = -jnp.sum(f1 * (jnp.cross(o2, f2) @ Rpart.T), -1)
        c5 = -jnp.sum(jnp.cross(o1, f1) * Rf2, -1)
        return jnp.concatenate([c3, c4[:, None], c5[:, None]], -1)

    M, C, K = rows(rot_s2), rows(rot_s1), rows(rot_c)
    s, x, real_mask, m_ok = _solve_qep(M, C, K)
    R = _rot_about_axis_from_s(axis, s)                     # (10, 3, 3)
    w = x[:, 4]
    w_ok = jnp.abs(w) > 1e-12
    wsafe = jnp.where(w_ok, w, 1.0)
    t = x[:, :3] / wsafe[:, None]
    scale = x[:, 3] / wsafe
    valid = real_mask & m_ok & w_ok & (scale > 0)

    # Zero-rotation fallback: null vector of M.
    _, vecs = jnp.linalg.eigh(M.T @ M)
    k = vecs[:, 0]
    kw_ok = jnp.abs(k[4]) > 1e-12
    ksafe = jnp.where(kw_ok, k[4], 1.0)
    t0 = k[:3] / ksafe
    s0 = k[3] / ksafe
    fb_t = jnp.stack([t0, t0])
    fb_s = jnp.stack([s0, s0])
    fb_R = jnp.broadcast_to(eye, (2, 3, 3))
    fb_valid = jnp.stack([~m_ok & kw_ok & (s0 > 0),
                          jnp.zeros((), bool)])

    R_all = jnp.concatenate([R, fb_R], axis=0)
    t_all = jnp.concatenate([t, fb_t], axis=0)
    s_all = jnp.concatenate([scale, fb_s], axis=0)
    valid_all = jnp.concatenate([valid, fb_valid], axis=0)
    return R_all, t_all, s_all, valid_all

"""Shared two-view geometry utilities (batched).

ref: src/theia/sfm/pose/util.h, essential_matrix_utils.h,
fundamental_matrix_util.h — Sampson/epipolar distances, essential
matrix composition/decomposition, cheirality-based pose selection.
Convention throughout: x2^T M x1 = 0 with M mapping image 1 -> image 2,
and the relative pose (R, t) maps camera-1 coordinates to camera-2:
p2 = R p1 + t. E = [t]_x R.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import rotation as rot


def _homog(x):
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def sampson_distance_sq(F, x1, x2):
    """Squared Sampson distance. F (..., 3, 3); x1/x2 (..., N, 2) or (..., 2).

    ref: sfm/pose/util.cc SquaredSampsonDistance.
    """
    x1h, x2h = _homog(x1), _homog(x2)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1h)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2h)
    c = jnp.einsum("...ni,...ni->...n", x2h, Fx1)
    denom = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 +
             Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
    return c * c / jnp.maximum(denom, 1e-15)


def epipolar_distance_sq(F, x1, x2):
    """Squared symmetric epipolar (point-to-line) distance."""
    x1h, x2h = _homog(x1), _homog(x2)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1h)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2h)
    c = jnp.einsum("...ni,...ni->...n", x2h, Fx1)
    d1 = c * c / jnp.maximum(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2, 1e-15)
    d2 = c * c / jnp.maximum(Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2, 1e-15)
    return 0.5 * (d1 + d2)


def essential_from_rt(R, t):
    """E = [t]_x R, normalized so ||t|| = 1 (..., 3, 3)."""
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-15)
    return rot.skew(t) @ R


def decompose_essential(E):
    """E -> (R1, R2, t) candidate factors via SVD (ref
    essential_matrix_utils.cc DecomposeEssentialMatrix). Four pose
    candidates: (R1, t), (R1, -t), (R2, t), (R2, -t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce det(U), det(V) = +1 to get proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0], [1, 0, 0], [0, 0, 1]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def _depths_two_view(R, t, x1, x2):
    """Midpoint-free two-view depth signs: for rays f1 (cam1) and f2 (cam2),
    with p2 = R p1 + t, solve [R f1, -f2] [s1, s2]^T = -t in lstsq closed
    form; return (s1, s2) per correspondence. x1/x2 normalized (..., N, 2)."""
    f1 = _homog(x1)
    f2 = _homog(x2)
    Rf1 = jnp.einsum("...ij,...nj->...ni", R, f1)
    # 2x2 normal equations for A = [Rf1, -f2]
    a11 = jnp.sum(Rf1 * Rf1, axis=-1)
    a12 = -jnp.sum(Rf1 * f2, axis=-1)
    a22 = jnp.sum(f2 * f2, axis=-1)
    b1 = -jnp.einsum("...ni,...i->...n", Rf1, t)
    b2 = jnp.einsum("...ni,...i->...n", f2, t)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-15, 1e-15, det)
    s1 = (b1 * a22 - a12 * b2) / det
    s2 = (a11 * b2 - a12 * b1) / det
    return s1, s2


def relative_pose_from_essential(E, x1, x2, mask=None):
    """Select the (R, t) among the 4 essential decompositions with the
    most points passing cheirality (ref
    GetBestPoseFromEssentialMatrix). x1/x2 normalized coords (N, 2).

    Returns (R (3,3), t (3,), num_in_front).
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])

    def count(R_, t_):
        s1, s2 = _depths_two_view(R_, t_, x1, x2)
        ok = (s1 > 0) & (s2 > 0)
        if mask is not None:
            ok = ok & mask
        return jnp.sum(ok)

    counts = jnp.stack([count(Rs[i], ts[i]) for i in range(4)])
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best]


def fundamental_from_projections(P1, P2):
    """F from two (3, 4) projection matrices (ref
    fundamental_matrix_util.cc FundamentalMatrixFromProjectionMatrices):
    F_ij = (-1)^(i+j) det [P1 minus row j; P2 minus row i]."""
    rows = [0, 1, 2]
    F = []
    for i in rows:
        for j in rows:
            X = jnp.stack([P1[..., k, :] for k in rows if k != j] +
                          [P2[..., k, :] for k in rows if k != i], axis=-2)
            F.append(((-1.0) ** (i + j)) * jnp.linalg.det(X))
    return jnp.stack(F, axis=-1).reshape(P1.shape[:-2] + (3, 3))


def fundamental_from_essential(E, f1, f2, pp1=None, pp2=None):
    """F = K2^-T E K1^-1 for simple pinhole K (focal f, principal pp)."""
    def kinv(f, pp):
        if pp is None:
            pp = jnp.zeros(2, dtype=E.dtype)
        return jnp.asarray([[1.0 / f, 0, -pp[0] / f],
                            [0, 1.0 / f, -pp[1] / f],
                            [0, 0, 1.0]], dtype=E.dtype)
    return kinv(f2, pp2).T @ E @ kinv(f1, pp1)

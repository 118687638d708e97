"""DLT PnP: full projection matrix from N >= 6 2D-3D correspondences,
plus RQ decomposition into K, R, t.

ref: src/theia/sfm/pose/ projection-matrix utilities
(four_point_focal_length.h's role is covered by this solver at sample
size 6 until the Groebner P4Pf lands) and
src/theia/math/matrix/rq_decomposition.h.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import rotation as rot


def _normalize_2d(x, w=None):
    if w is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(x - mean, axis=-1), axis=-1), 1e-12)
    else:
        sw = jnp.maximum(jnp.sum(w, -1), 1e-12)
        mean = jnp.sum(x * w[..., None], -2, keepdims=True) / sw[..., None,
                                                                 None]
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sum(jnp.linalg.norm(x - mean, axis=-1) * w, -1) / sw,
            1e-12)
    return (x - mean) * scale[..., None, None], mean[..., 0, :], scale


def dlt_pnp(world, image, weights=None):
    """Projection matrix P (3, 4) s.t. image ~ P [world; 1].

    world (N, 3), image (N, 2), N >= 6. Returns (P, ok).
    """
    xn, mean2, s2 = _normalize_2d(image, weights)
    Xn, mean3, s3 = _normalize_2d_3(world, weights)
    u, v = xn[..., 0], xn[..., 1]
    X = jnp.concatenate([Xn, jnp.ones_like(Xn[..., :1])], axis=-1)
    z = jnp.zeros_like(X)
    r1 = jnp.concatenate([X, z, -u[..., None] * X], axis=-1)  # (N, 12)
    r2 = jnp.concatenate([z, X, -v[..., None] * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    if weights is not None:
        ww = jnp.concatenate([weights, weights], axis=-1)
        A = A * ww[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    P = vecs[..., :, 0].reshape(3, 4)
    # denormalize: T2^-1 P T3
    T2_inv = jnp.asarray(
        [[1.0 / s2, 0, mean2[0]], [0, 1.0 / s2, mean2[1]], [0, 0, 1.0]])
    T3 = jnp.zeros((4, 4), world.dtype)
    T3 = T3.at[0, 0].set(s3).at[1, 1].set(s3).at[2, 2].set(s3)
    T3 = T3.at[0, 3].set(-s3 * mean3[0]).at[1, 3].set(-s3 * mean3[1])
    T3 = T3.at[2, 3].set(-s3 * mean3[2]).at[3, 3].set(1.0)
    P = T2_inv @ P @ T3
    ok = jnp.linalg.norm(P) > 1e-12
    return P, ok


def _normalize_2d_3(X, w=None):
    if w is None:
        mean = jnp.mean(X, axis=-2, keepdims=True)
        scale = jnp.sqrt(3.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(X - mean, axis=-1), axis=-1), 1e-12)
    else:
        sw = jnp.maximum(jnp.sum(w, -1), 1e-12)
        mean = jnp.sum(X * w[..., None], -2, keepdims=True) / sw[..., None,
                                                                 None]
        scale = jnp.sqrt(3.0) / jnp.maximum(
            jnp.sum(jnp.linalg.norm(X - mean, axis=-1) * w, -1) / sw,
            1e-12)
    return (X - mean) * scale[..., None, None], mean[..., 0, :], scale


def decompose_projection_matrix(P):
    """P -> (K (3,3) upper-triangular, positive diagonal; extrinsics
    (6,) [position, angle-axis]). ref: rq_decomposition.h +
    projection matrix utils; implemented via Givens-free RQ through QR
    of the flipped matrix."""
    M = P[:, :3]
    # RQ via QR of reversed/transposed matrix
    rev = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]], P.dtype)
    Q_, R_ = jnp.linalg.qr((rev @ M).T)
    K = rev @ R_.T @ rev
    R = rev @ Q_.T
    # force positive diagonal of K
    sign = jnp.sign(jnp.diagonal(K))
    sign = jnp.where(sign == 0, 1.0, sign)
    D = jnp.diag(sign)
    K = K @ D
    R = D @ R
    # proper rotation: det(-R) = -det(R) for 3x3, so scaling both K and
    # R by detR flips an improper R while preserving M = K R
    detR = jnp.linalg.det(R)
    R = R * detR
    K = K * detR
    # solve for t BEFORE normalizing K (P and K share the projective
    # scale; normalizing first loses it)
    t = jnp.linalg.solve(K, P[:, 3])
    K = K / K[2, 2]
    c = -R.T @ t
    aa = rot.rotation_matrix_to_angle_axis(R)
    return K, jnp.concatenate([c, aa])


def six_point_pnp(world, image):
    """Engine-format minimal solver (sample size 6): returns
    (models (1, 10) [extrinsics(6), focal, aspect, ppx, ppy], valid)."""
    P, ok = dlt_pnp(world, image)
    K, extr = decompose_projection_matrix(P)
    model = jnp.concatenate([
        extr, jnp.stack([K[0, 0], K[1, 1] / K[0, 0], K[0, 2], K[1, 2]])])
    finite = jnp.all(jnp.isfinite(model))
    return model[None], (ok & finite)[None]

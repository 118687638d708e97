"""Batched multi-view triangulation.

TPU-native counterpart of ref: src/theia/sfm/triangulation/triangulation.h:48-68
(Triangulate = Lindstrom iterative optimal two-view, TriangulateDLT,
TriangulateMidpoint, TriangulateNView SVD, cheirality and angle tests).

Design: every routine is expressed over fixed-size stacked inputs with a
validity mask so that thousands of tracks triangulate in ONE fused XLA
computation (the reference instead fans individual tracks onto a thread
pool, ref: src/theia/sfm/estimate_track.cc:172-191).

Projection matrices are (3, 4) world->pixel maps: P = K [R | -R c].
N-view inputs are padded to a static `max_views` with `mask`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math import rotation as rot


def projection_matrix(extrinsics, K):
    """extrinsics (..., 6) [c, aa], K (..., 3, 3) -> P (..., 3, 4)."""
    R = rot.angle_axis_to_rotation_matrix(extrinsics[..., 3:6])
    t = -jnp.einsum("...ij,...j->...i", R, extrinsics[..., 0:3])
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.einsum("...ij,...jk->...ik", K, Rt)


def calibration_matrix(intr):
    """Padded intrinsics vector -> (..., 3, 3) K (linear part only)."""
    f = intr[..., 0]
    fy = f * intr[..., 1]
    s = intr[..., 2]
    px, py = intr[..., 3], intr[..., 4]
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    return jnp.stack([f, s, px, z, fy, py, z, z, o], axis=-1).reshape(
        intr.shape[:-1] + (3, 3))


def triangulate_dlt(P1, P2, x1, x2):
    """Two-view DLT. P (..., 3, 4); x (..., 2) pixel (or normalized) coords.

    Returns homogeneous (..., 4). ref: triangulation.cc TriangulateDLT.
    """
    rows = jnp.stack([
        x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ], axis=-2)  # (..., 4, 4)
    return _smallest_singular_vector(rows)


def triangulate_nview(Ps, xs, mask=None):
    """N-view DLT via the normal-equation form.

    Ps (..., V, 3, 4), xs (..., V, 2), mask (..., V) -> homogeneous (..., 4).

    Uses sum_v A_v^T A_v (4x4 symmetric) + smallest eigenvector —
    identical solution to stacked-SVD (ref TriangulateNViewSVD) but with
    a fixed 4x4 eigendecomposition regardless of V: the TPU-friendly
    formulation (self-adjoint eigh IS supported and batchable on device).
    """
    rows = jnp.stack([
        xs[..., 0, None] * Ps[..., 2, :] - Ps[..., 0, :],
        xs[..., 1, None] * Ps[..., 2, :] - Ps[..., 1, :],
    ], axis=-2)  # (..., V, 2, 4)
    if mask is not None:
        rows = rows * mask[..., None, None]
    A = rows.reshape(rows.shape[:-3] + (-1, 4))  # (..., 2V, 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., :, 0]
    return _canon_homog(X)


def triangulate_midpoint(origins, directions, mask=None):
    """Midpoint of N rays. origins/directions (..., V, 3), unit dirs.

    Solves sum_v (I - d d^T) X = sum_v (I - d d^T) o.
    ref: triangulation.cc TriangulateMidpoint.
    """
    d = directions
    eye = jnp.eye(3, dtype=d.dtype)
    A_v = eye - d[..., :, None] * d[..., None, :]  # (..., V, 3, 3)
    b_v = jnp.einsum("...vij,...vj->...vi", A_v, origins)
    if mask is not None:
        A_v = A_v * mask[..., None, None]
        b_v = b_v * mask[..., None]
    A = jnp.sum(A_v, axis=-3)
    b = jnp.sum(b_v, axis=-2)
    X = jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def triangulate_two_view_optimal(P1, P2, x1, x2, E, iters: int = 10):
    """Lindstrom (2010) iterative optimal two-view triangulation in
    normalized coordinates. x1/x2 are NORMALIZED image points (..., 2),
    E the essential matrix mapping 1->2 s.t. x2^T E x1 = 0.
    Correction step mirrors ref Triangulate (triangulation.cc:87-124),
    expressed as a fixed-iteration Gauss-Newton on the epipolar residual,
    then DLT on the corrected points.
    """
    S = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]], dtype=x1.dtype)

    def to_h(x):
        return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)

    x1h, x2h = to_h(x1), to_h(x2)
    E_t = jnp.swapaxes(E, -1, -2)

    def body(_, carry):
        x1c, x2c = carry
        # epipolar residual and its gradient wrt the 2D corrections
        Ex1 = jnp.einsum("...ij,...j->...i", E, to_h(x1c))
        Etx2 = jnp.einsum("...ij,...j->...i", E_t, to_h(x2c))
        c = jnp.einsum("...i,...i->...", to_h(x2c), Ex1)
        n1 = Ex1[..., :2]
        n2 = Etx2[..., :2]
        denom = jnp.sum(n1 * n1, axis=-1) + jnp.sum(n2 * n2, axis=-1)
        lam = c / jnp.where(denom < 1e-15, 1.0, denom)
        x1n = x1 - lam[..., None] * n2  # correct original points
        x2n = x2 - lam[..., None] * n1
        return (x1n, x2n)

    x1c, x2c = jax.lax.fori_loop(0, iters, body, (x1, x2))
    del S, x1h, x2h
    return triangulate_dlt(P1, P2, x1c, x2c)


def is_in_front_of_cameras(extrinsics, X, mask=None):
    """Cheirality: depth > 0 for every (valid) view. extrinsics (..., V, 6),
    X homogeneous (..., 4). ref IsTriangulatedPointInFrontOfCameras."""
    p = X[..., None, :3] / jnp.where(
        jnp.abs(X[..., None, 3:]) < 1e-15, 1e-15, X[..., None, 3:])
    cam_pt = rot.angle_axis_rotate_point(
        extrinsics[..., 3:6], p - extrinsics[..., 0:3])
    front = cam_pt[..., 2] > 0
    if mask is not None:
        front = front | ~mask
    return jnp.all(front, axis=-1)


def triangulation_angles(origins, X, mask=None):
    """Max pairwise angle between viewing rays (degrees).

    ref SufficientTriangulationAngle: uses pairwise angles between all
    observing rays. origins (..., V, 3); X homogeneous (..., 4).
    """
    p = X[..., None, :3] / jnp.where(
        jnp.abs(X[..., None, 3:]) < 1e-15, 1e-15, X[..., None, 3:])
    rays = p - origins
    rays = rays / jnp.maximum(
        jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-15)
    cos = jnp.einsum("...vi,...wi->...vw", rays, rays)
    if mask is not None:
        pair_ok = mask[..., :, None] & mask[..., None, :]
        cos = jnp.where(pair_ok, cos, 1.0)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    return jnp.max(ang, axis=(-1, -2))


def _smallest_singular_vector(A):
    """Right singular vector of (..., M, 4) A for smallest singular value,
    via eigh of A^T A (TPU-supported), canonicalized."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return _canon_homog(vecs[..., :, 0])


def _canon_homog(X):
    """Flip sign so w >= 0 (stable canonical form for homogeneous pts)."""
    return X * jnp.where(X[..., 3:] < 0, -1.0, 1.0)

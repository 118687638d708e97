"""4-point (minimal) and weighted N-point homography via normalized DLT.

ref: src/theia/sfm/pose/four_point_homography.{h,cc}. Same eigh-based
nullspace trick as eight_point.py; x2 ~ H x1.
"""
from __future__ import annotations

import jax.numpy as jnp

from .eight_point import _normalize_points


def _homography_rows(x1, x2):
    """(..., N, 2, 9) DLT rows for x2 ~ H x1."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([z, z, z, u1, v1, o, -v2 * u1, -v2 * v1, -v2], axis=-1)
    return jnp.stack([r1, r2], axis=-2)


def npoint_homography(x1, x2, weights=None):
    """Weighted N >= 4 point homography. Returns (H (..., 3, 3), ok)."""
    x1n, T1 = _normalize_points(x1, weights)
    x2n, T2 = _normalize_points(x2, weights)
    rows = _homography_rows(x1n, x2n)
    if weights is not None:
        rows = rows * weights[..., None, None]
    A = rows.reshape(rows.shape[:-3] + (-1, 9))
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    H = vecs[..., :, 0].reshape(AtA.shape[:-2] + (3, 3))
    # denormalize: H = T2^-1 Hn T1
    T2_inv = jnp.linalg.inv(T2)
    H = T2_inv @ H @ T1
    det = jnp.linalg.det(H)
    ok = jnp.abs(det) > 1e-12
    H = H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1.0,
                      H[..., 2:3, 2:3])
    return H, ok


def four_point_homography(x1, x2):
    """Engine-format minimal solver: (H[1, 3, 3], valid[1])."""
    H, ok = npoint_homography(x1, x2)
    return H[None], ok[None]


def homography_transfer_error_sq(H, x1, x2):
    """Squared symmetric-free forward transfer error |x2 - H x1|^2
    (ref homography error used by estimate_homography.cc)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Hx = jnp.einsum("...ij,...nj->...ni", H, x1h)
    w = Hx[..., 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    proj = Hx[..., :2] / w[..., None]
    return jnp.sum((proj - x2) ** 2, axis=-1)

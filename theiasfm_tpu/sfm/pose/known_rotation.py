"""Minimal solvers with known (partial) rotation.

ref: src/theia/sfm/pose/relative_pose_from_two_points_with_known_rotation.{h,cc}
(translation from 2 correspondences given R — linear epipolar system),
src/theia/sfm/pose/position_from_two_rays.{h,cc} (position given global
orientation + two 2D-3D matches; also provided as a RANSAC spec in
pipeline/hybrid.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import rotation as rot


def relative_pose_from_two_points_with_known_rotation(x1, x2, R):
    """Translation t (unit, up to sign fixed by cheirality) s.t.
    x2h^T [t]_x R x1h = 0 for both correspondences.

    x1/x2 (2, 2) normalized coords; R (3, 3) with p2 = R p1 + t.
    Returns (t (3,), valid ()).
    """
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)
    Rx1 = x1h @ R.T                     # (2, 3)
    # constraint: t . (x2h x Rx1) = 0 -> t ∝ cross of the two normals
    n1 = jnp.cross(x2h[0], Rx1[0])
    n2 = jnp.cross(x2h[1], Rx1[1])
    t = jnp.cross(n1, n2)
    norm = jnp.linalg.norm(t)
    valid = norm > 1e-12
    t = t / jnp.where(valid, norm, 1.0)
    # cheirality: pick the sign putting point 1 in front of both views
    f1 = x1h[0] / jnp.linalg.norm(x1h[0])
    f2 = x2h[0] / jnp.linalg.norm(x2h[0])
    Rf1 = R @ f1
    a11 = jnp.dot(Rf1, Rf1)
    a12 = -jnp.dot(Rf1, f2)
    a22 = jnp.dot(f2, f2)
    b1 = -jnp.dot(Rf1, t)
    b2 = jnp.dot(f2, t)
    det = a11 * a22 - a12 * a12
    s1 = (b1 * a22 - a12 * b2) / jnp.where(jnp.abs(det) < 1e-15, 1e-15,
                                           det)
    t = jnp.where(s1 < 0, -t, t)
    return t, valid

"""Rotation algebra: angle-axis <-> matrix <-> quaternion, batched & autodiff-safe.

TPU-native counterpart of the reference's rotation utilities
(ref: src/theia/math/rotation.h, src/theia/math/util.h and the Ceres
rotation conventions used throughout src/theia/sfm/camera/camera.h).
Extrinsics in this framework use the same convention as the reference:
a world->camera rotation stored as a 3-vector angle-axis.

All functions are pure, shape-polymorphic over leading batch dims via
explicit batched math (no data-dependent control flow), and safe at the
theta -> 0 limit for autodiff (Taylor-switched with jnp.where guards on
both branches).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _theta(aa):
    """Rotation angle with a grad-safe sqrt at zero."""
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, _EPS))


def angle_axis_to_rotation_matrix(aa):
    """angle-axis (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    theta = _theta(aa)[..., 0]
    small = theta < 1e-6
    # Guard the division so the small-angle branch never sees 0/0 in grads.
    safe_theta = jnp.where(small, 1.0, theta)
    axis = aa / safe_theta[..., None]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    one_c = 1.0 - c
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    R = jnp.stack(
        [
            c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s,
            y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s,
            z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c,
        ],
        axis=-1,
    ).reshape(aa.shape[:-1] + (3, 3))
    # Small-angle: R ~ I + skew(aa)  (first-order Rodrigues)
    K = skew(aa)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), R.shape)
    R_small = eye + K
    return jnp.where(small[..., None, None], R_small, R)


def rotation_matrix_to_angle_axis(R):
    """rotation matrix (..., 3, 3) -> angle-axis (..., 3).

    Via quaternion for stability near theta = 0 and theta = pi.
    """
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(R))


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def angle_axis_rotate_point(aa, pt):
    """Rotate points (..., 3) by angle-axis (..., 3) without forming R.

    Matches Ceres AngleAxisRotatePoint semantics used by the reference's
    camera projection (ref: src/theia/sfm/camera/camera.h extrinsics doc).
    """
    theta = _theta(aa)[..., 0]
    small = theta < 1e-6
    safe_theta = jnp.where(small, 1.0, theta)
    axis = aa / safe_theta[..., None]
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]
    axis_cross_pt = jnp.cross(axis, pt)
    axis_dot_pt = jnp.sum(axis * pt, axis=-1, keepdims=True)
    rotated = pt * c + axis_cross_pt * s + axis * axis_dot_pt * (1.0 - c)
    # Small-angle: p + aa x p
    rotated_small = pt + jnp.cross(aa, pt)
    return jnp.where(small[..., None], rotated_small, rotated)


def quaternion_to_rotation_matrix(q):
    """Unit quaternion (..., 4) [w, x, y, z] -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))


def rotation_matrix_to_quaternion(R):
    """(..., 3, 3) -> unit quaternion (..., 4) [w, x, y, z], w >= 0.

    Branch-free Shepperd method: compute all four candidate quaternions
    and select the best-conditioned one (largest pivot) with jnp.where.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by a different pivot (4q_i^2 = pivot).
    def cand(p, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(p, _EPS)) * 2.0  # s = 4 * pivot_component
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1)

    # pivot on w: p = 1 + tr
    q_w = cand(1.0 + tr, 1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    # pivot on x: p = 1 + m00 - m11 - m22
    q_x = cand(1.0 + m00 - m11 - m22, m21 - m12, 1.0 + m00 - m11 - m22,
               m01 + m10, m02 + m20)
    # pivot on y
    q_y = cand(1.0 - m00 + m11 - m22, m02 - m20, m01 + m10,
               1.0 - m00 + m11 - m22, m12 + m21)
    # pivot on z
    q_z = cand(1.0 - m00 - m11 + m22, m10 - m01, m02 + m20, m12 + m21,
               1.0 - m00 - m11 + m22)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_angle_axis(q):
    """Unit quaternion (..., 4) [w, x, y, z] -> angle-axis (..., 3)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), _EPS))
    theta = 2.0 * jnp.arctan2(sin_half, w)
    small = sin_half < 1e-7
    scale = jnp.where(small, 2.0, theta / jnp.where(small, 1.0, sin_half))
    return v * scale[..., None]


def angle_axis_to_quaternion(aa):
    theta = _theta(aa)[..., 0]
    half = 0.5 * theta
    small = theta < 1e-6
    safe_theta = jnp.where(small, 1.0, theta)
    k = jnp.where(small, 0.5, jnp.sin(half) / safe_theta)
    w = jnp.cos(half)
    return jnp.concatenate([w[..., None], aa * k[..., None]], axis=-1)


def multiply_rotations(aa1, aa2):
    """Compose angle-axis rotations: result = R(aa1) @ R(aa2), in aa form."""
    q1 = angle_axis_to_quaternion(aa1)
    q2 = angle_axis_to_quaternion(aa2)
    return quaternion_to_angle_axis(quaternion_multiply(q1, q2))


def quaternion_multiply(q1, q2):
    w1, v1 = q1[..., :1], q1[..., 1:]
    w2, v2 = q2[..., :1], q2[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


def relative_rotation(aa_1, aa_2):
    """Angle-axis of R_2 @ R_1^T (rotation from frame 1 to frame 2)."""
    R1 = angle_axis_to_rotation_matrix(aa_1)
    R2 = angle_axis_to_rotation_matrix(aa_2)
    return rotation_matrix_to_angle_axis(R2 @ jnp.swapaxes(R1, -1, -2))


def rotation_angle_deg(aa):
    return jnp.degrees(_theta(aa)[..., 0])


def rotation_error_deg(aa_a, aa_b):
    """Angular distance in degrees between two angle-axis rotations."""
    Ra = angle_axis_to_rotation_matrix(aa_a)
    Rb = angle_axis_to_rotation_matrix(aa_b)
    rel = Ra @ jnp.swapaxes(Rb, -1, -2)
    cos = jnp.clip((jnp.trace(rel, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def project_to_rotation_matrix(M):
    """Nearest rotation matrix to (..., 3, 3) M via SVD (det +1 enforced)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(M.shape[:-2] + (3,), M.dtype).at[..., 2].set(det)
    return (U * D[..., None, :]) @ Vt

"""gDLS: generalized pose-and-scale (similarity transform from rays).

ref: src/theia/sfm/transformation/gdls_similarity_transform.{h,cc} —
"gDLS: A Scalable Solution to the Generalized Pose and Scale Problem"
(Sweeney et al., ECCV 2014). Given image rays (origin + direction) in
one frame and corresponding 3D points in another, find the similarity
(s, R, t) aligning the points onto the rays:

    s R X_i + ... wait — reference convention (gdls_similarity_transform.h:44-60):
    find (R, t, s) such that  depth_i * d_i + s * o_i ~= R X_i + t,
    i.e. the transformed world point lands on the (scaled-origin) ray.

Equivalently, minimize the depth-eliminated object-space cost

    J(R, t, s) = sum_i || (I - d_i d_i^T) (R X_i + t - s o_i) ||^2 .

TPU-first design: like upnp.py, the reference's Groebner machinery is
replaced by analytic elimination of (t, s) — linear given R — and a
lockstep SO(3)-covering multistart damped-Newton refine on the unit
quaternion sphere (shared engine `multistart_refine_quat`). The
elimination is exact, so on noise-free data the global minimum is an
exact root, matching the algebraic solver.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import rotation as rot
from .upnp import multistart_refine_quat, so3_covering_quats

__all__ = ["gdls_similarity_transform", "gdls_cost_matrix"]


def gdls_cost_matrix(ray_origins, ray_dirs, world_points):
    """Eliminate depths, translation, and scale from the gDLS cost.

    Returns (ts_of_R, cost_of_R): given R, ``ts_of_R(R) -> (t, s)`` is
    the exact least-squares optimum of the linear subproblem, and
    ``cost_of_R(R) -> (cost, t, s)`` the resulting cost.
    """
    o = jnp.asarray(ray_origins)
    d = jnp.asarray(ray_dirs)
    p = jnp.asarray(world_points)
    eye = jnp.eye(3, dtype=p.dtype)
    Q = eye[None] - d[:, :, None] * d[:, None, :]       # (n, 3, 3) projectors
    # Normal equations for z = [t; s] (4 unknowns), residual
    # r_i = Q_i (R p_i + t - s o_i):
    #   [ sum Q_i        -sum Q_i o_i      ] [t]   [-sum Q_i R p_i      ]
    #   [ -sum o_i^T Q_i  sum o_i^T Q_i o_i] [s] = [ sum o_i^T Q_i R p_i]
    Qsum = jnp.sum(Q, axis=0)                           # (3, 3)
    Qo = jnp.einsum("nij,nj->i", Q, o)                  # (3,)
    oQo = jnp.einsum("ni,nij,nj->", o, Q, o)            # ()
    A = jnp.zeros((4, 4), p.dtype)
    A = A.at[:3, :3].set(Qsum)
    A = A.at[:3, 3].set(-Qo)
    A = A.at[3, :3].set(-Qo)
    A = A.at[3, 3].set(oQo)
    A = A + 1e-12 * jnp.eye(4, dtype=p.dtype)

    def ts_of_R(R):
        y = p @ R.T                                     # (n, 3) = R p_i
        Qy = jnp.einsum("nij,nj->i", Q, y)              # (3,)
        oQy = jnp.einsum("ni,nij,nj->", o, Q, y)        # ()
        b = jnp.concatenate([-Qy, oQy[None]])
        z = jnp.linalg.solve(A, b)
        return z[:3], z[3]

    def cost_of_R(R):
        t, s = ts_of_R(R)
        r = p @ R.T + t - s * o                         # (n, 3)
        Qr = jnp.einsum("nij,nj->ni", Q, r)
        return jnp.sum(Qr * r), t, s

    return ts_of_R, cost_of_R


def gdls_similarity_transform(ray_origins, ray_dirs, world_points,
                              gn_iters: int = 12):
    """Generalized pose-and-scale: similarity aligning 3D points onto
    multi-camera image rays.

    ray_origins (n, 3): camera centers (un-scaled, in the query frame);
    ray_dirs (n, 3): unit ray directions; world_points (n, 3).
    Solves depth_i d_i + s o_i ~= R X_i + t in least squares
    (ref: gdls_similarity_transform.h:44-75). n >= 4.

    Returns (R (3,3), t (3,), s (), cost ()). jit/vmap friendly.
    """
    _, cost_of_R = gdls_cost_matrix(ray_origins, ray_dirs, world_points)
    starts = jnp.asarray(so3_covering_quats(),
                         jnp.asarray(world_points).dtype)

    def cost_q(q):
        cost, _, _ = cost_of_R(rot.quaternion_to_rotation_matrix(q))
        return cost

    qb = multistart_refine_quat(cost_q, starts, gn_iters)
    R = rot.quaternion_to_rotation_matrix(qb)
    cost, t, s = cost_of_R(R)
    return R, t, s, cost

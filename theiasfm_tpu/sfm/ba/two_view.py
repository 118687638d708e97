"""Two-view bundle adjustment.

ref: src/theia/sfm/bundle_adjustment/bundle_adjust_two_views.{h,cc}
(refine relative pose + triangulated points of a verified pair; also
the AngularEpipolarError variant) and
optimize_relative_position_with_known_rotation.{h,cc} (global pipeline
step 5).

Formulated as small fixed-shape Gauss-Newton problems, vmappable over
many pairs at once — the batched replacement for the reference's
per-pair Ceres solves inside geometric verification.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...math import rotation as rot


@partial(jax.jit, static_argnames=("iters",))
def bundle_adjust_two_views_angular(aa_rel, t_rel, x1, x2, weights,
                                    iters: int = 10):
    """Refine (R, t) on the ANGULAR epipolar error over normalized
    correspondences (ref AngularEpipolarError / BundleAdjustTwoViews
    angular mode). Batched over leading dims of aa_rel/t_rel.

    Returns (aa_refined, t_refined_unit).
    """
    p0 = jnp.concatenate([aa_rel, t_rel], axis=-1)
    sw = jnp.sqrt(weights)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], -1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], -1)
    f1 = x1h / jnp.linalg.norm(x1h, axis=-1, keepdims=True)
    f2 = x2h / jnp.linalg.norm(x2h, axis=-1, keepdims=True)

    def residual(p):
        R = rot.angle_axis_to_rotation_matrix(p[:3])
        t = p[3:6]
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        E = rot.skew(t) @ R
        # angular epipolar error: f2^T E f1 (normalized rays)
        return sw * jnp.einsum("ni,ij,nj->n", f2, E, f1)

    def step(_, p):
        r = residual(p)
        J = jax.jacfwd(residual)(p)
        JtJ = J.T @ J + 1e-12 * jnp.eye(6, dtype=p.dtype)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        p_new = p - delta
        better = jnp.sum(residual(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p)

    p = jax.lax.fori_loop(0, iters, step, p0)
    t = p[3:6] / jnp.maximum(jnp.linalg.norm(p[3:6]), 1e-12)
    return p[:3], t


@partial(jax.jit, static_argnames=("iters",))
def optimize_relative_position_with_known_rotation(
        rel_position, R1, R2, x1, x2, weights, iters: int = 12):
    """Refine the relative position t (unit) given FIXED global
    rotations, from feature correspondences (ref
    optimize_relative_position_with_known_rotation.cc — global pipeline
    step 5). Minimizes the epipolar constraint with rotations folded
    in: for rays r1 = R1^T f1, r2 = R2^T f2 (world frame), residual =
    t . (r1 x r2) scaled — the 'translation direction' constraint.

    rel_position: initial position of camera 2 in camera-1 frame.
    Returns refined unit position_2 (camera-1 frame).
    """
    # world-frame rays
    f1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], -1)
    f2 = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], -1)
    r1 = f1 @ R1  # R1^T applied rowwise
    r2 = f2 @ R2
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    cross = jnp.cross(r1, r2)
    cross = cross * jnp.sqrt(weights)[:, None]
    # direction in world frame
    t0_world = rel_position @ R1  # R1^T t

    def residual(t):
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return cross @ t

    def step(_, t):
        r = residual(t)
        J = jax.jacfwd(residual)(t)
        JtJ = J.T @ J + 1e-10 * jnp.eye(3, dtype=t.dtype)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        t_new = t - delta
        better = jnp.sum(residual(t_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, t_new, t)

    t = jax.lax.fori_loop(0, iters, step, t0_world)
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    # keep the sign consistent with the initialization
    sign = jnp.where(jnp.dot(t, t0_world) < 0, -1.0, 1.0)
    t_world = t * sign
    # back to camera-1 frame
    return R1 @ t_world

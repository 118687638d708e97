"""P4Pf — absolute pose + focal length from 4 correspondences.

ref: src/theia/sfm/pose/four_point_focal_length.{h,cc} (Bujnak et al.'s
Groebner-basis minimal solver). TPU-shaped replacement with identical
interface semantics: a FOCAL SWEEP — P3P (Grunert) on 3 of the points
for each of F log-spaced focal candidates (all F*4 solutions evaluated
in one batched computation), scored by the 4th point's reprojection,
followed by a joint Gauss-Newton polish over (extrinsics, focal). Grid
+ batch replaces symbolic elimination: ~F x the arithmetic, but it's
exactly the shape the MXU/VPU eat, and the polish restores minimal-
solver accuracy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...math import rotation as rot
from .p3p import p3p_grunert

_NUM_FOCAL_CANDIDATES = 24
_MAX_MODELS = 4


def p4pf(world, image_px, focal_lo: float = 0.2, focal_hi: float = 5.0):
    """world (4, 3); image_px (4, 2) pixels CENTERED on the principal
    point. Focal candidates span [lo, hi] * max|image coordinate|-scaled
    heuristic base (1.0 * max coordinate magnitude works across typical
    FoVs).

    Returns (models (4, 7) [position, angle-axis, focal], valid (4,)).
    """
    dtype = world.dtype
    base = jnp.maximum(jnp.max(jnp.abs(image_px)), 1e-6) * 1.5
    fracs = jnp.logspace(jnp.log10(focal_lo), jnp.log10(focal_hi),
                         _NUM_FOCAL_CANDIDATES, dtype=dtype)
    focals = base * fracs                                 # (F,)

    def try_focal(f):
        norm = image_px / f

        def sub(sel3, held):
            extr, valid = p3p_grunert(world[sel3], norm[sel3])  # (4, 6)
            p_cam = rot.angle_axis_rotate_point(
                extr[:, 3:6], jnp.broadcast_to(world[held], (4, 3)) -
                extr[:, 0:3])
            z = p_cam[:, 2]
            bad = z < 1e-6
            proj = p_cam[:, :2] / jnp.where(bad, 1.0, z)[:, None]
            err = jnp.sum((proj - norm[held]) ** 2, axis=-1)
            return extr, jnp.where(valid & ~bad, err, jnp.inf)

        # two 3-subsets for degeneracy robustness
        e1, r1 = sub(jnp.asarray([0, 1, 2]), 3)
        e2, r2 = sub(jnp.asarray([0, 1, 3]), 2)
        return (jnp.concatenate([e1, e2]),
                jnp.concatenate([r1, r2]))

    extrs, errs = jax.vmap(try_focal)(focals)  # (F, 8, 6), (F, 8)
    flat_err = errs.reshape(-1)
    order = jnp.argsort(flat_err)[:_MAX_MODELS]
    fi = order // 8
    si = order % 8
    cand_extr = extrs[fi, si]                  # (4, 6)
    cand_f = focals[fi]                        # (4,)
    cand_valid = jnp.isfinite(flat_err[order])

    # joint GN polish over (extrinsics 6, focal 1) on all 4 points
    def polish(extr, f):
        p0 = jnp.concatenate([extr, f[None]])

        def residual(p):
            pc = rot.angle_axis_rotate_point(
                jnp.broadcast_to(p[3:6], world.shape), world - p[0:3])
            z = jnp.maximum(pc[:, 2], 1e-6)
            proj = pc[:, :2] / z[:, None] * p[6]
            return (proj - image_px).reshape(-1)

        def step(_, p):
            r = residual(p)
            J = jax.jacfwd(residual)(p)
            JtJ = J.T @ J + 1e-8 * jnp.eye(7, dtype=dtype)
            delta = jnp.linalg.solve(JtJ, J.T @ r)
            p_new = p - delta
            better = jnp.sum(residual(p_new) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, p_new, p)

        return jax.lax.fori_loop(0, 15, step, p0)

    polished = jax.vmap(polish)(cand_extr, cand_f)   # (4, 7)
    valid = cand_valid & (polished[:, 6] > 0) & \
        jnp.all(jnp.isfinite(polished), axis=-1)
    return polished, valid

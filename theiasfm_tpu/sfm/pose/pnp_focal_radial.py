"""Absolute pose + focal length + radial distortion minimal solvers.

ref: src/theia/sfm/pose/four_point_focal_length_radial_distortion.{h,cc}
(P4Pfr, Larsson et al. ICCV 2017 — Groebner basis) and
src/theia/sfm/pose/five_point_focal_length_radial_distortion.{h,cc}
(P5Pfr, Kukelova et al. ICCV 2013 — null-space + SVD). Both reference
solvers are algebraic eliminations that do not map to XLA.

TPU-shaped replacement with the same interface semantics, extending the
focal-sweep design of p4pf.py to a 2-D (focal, distortion) sweep:

- undistort the observed pixels with each candidate division-model
  distortion k (u = d / (1 + k r^2), matching the reference's
  DIVISION_UNDISTORTION convention,
  division_undistortion_camera_model.h);
- for each (k, f) grid cell run batched P3P (Grunert) on 3-point
  subsets and score the held-out point(s) by undistorted reprojection;
- polish the best candidates with a joint Gauss-Newton over
  (position, angle-axis, focal, k1[, k2, k3]).

The whole grid is one vmapped computation (K*F*subsets*4 tiny solves —
exactly the shape the VPU eats), and the polish restores minimal-solver
accuracy: with 4 points and nk=1 the system is exactly determined
(8 residuals, 8 unknowns), so Newton converges to the algebraic root.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...math import rotation as rot
from .p3p import p3p_grunert

__all__ = ["four_point_focal_length_radial_distortion",
           "five_point_focal_length_radial_distortion"]

_NUM_FOCAL = 16
_NUM_DIST = 12
_MAX_MODELS = 4


def _sweep_candidates(world, image_px, focal_lo, focal_hi, dist_lo,
                      dist_hi):
    """(f, k) grid sweep. Returns (extrs (C, 6), focals (C,), ks (C,),
    errs (C,)) over all C = K*F*S*4 candidates."""
    dtype = world.dtype
    n = world.shape[0]
    base = jnp.maximum(jnp.max(jnp.abs(image_px)), 1e-6) * 1.5
    fracs = jnp.logspace(jnp.log10(focal_lo), jnp.log10(focal_hi),
                         _NUM_FOCAL, dtype=dtype)
    focals = base * fracs                                   # (F,)
    r2 = jnp.sum(image_px ** 2, axis=-1)                    # (n,)
    r2max = jnp.maximum(jnp.max(r2), 1e-9)
    # normalized distortion kappa = k * r2max, mostly barrel (k < 0)
    kappas = jnp.linspace(dist_lo, dist_hi, _NUM_DIST, dtype=dtype)
    ks = kappas / r2max                                     # (K,)

    # 3-point subsets; held-out indices score the model
    if n == 4:
        subsets = jnp.asarray([[0, 1, 2], [0, 1, 3]])
        held = jnp.asarray([[3], [2]])
    else:
        subsets = jnp.asarray([[0, 1, 2], [0, 3, 4], [1, 2, 3]])
        held = jnp.asarray([[3, 4], [1, 2], [0, 4]])

    def try_kf(k, f):
        undist = image_px / (1.0 + k * r2)[:, None]
        norm = undist / f

        def sub(sel3, heldi):
            extr, valid = p3p_grunert(world[sel3], norm[sel3])  # (4, 6)

            def held_err(extr1, ok):
                p_cam = rot.angle_axis_rotate_point(
                    jnp.broadcast_to(extr1[3:6], (held.shape[1], 3)),
                    world[heldi] - extr1[0:3])
                z = p_cam[:, 2]
                bad = jnp.any(z < 1e-6)
                proj = p_cam[:, :2] / jnp.maximum(z, 1e-6)[:, None]
                err = jnp.sum((proj - norm[heldi]) ** 2)
                return jnp.where(ok & ~bad, err, jnp.inf)

            errs = jax.vmap(held_err)(extr, valid)
            return extr, errs

        extrs, errs = jax.vmap(sub)(subsets, held)   # (S, 4, 6), (S, 4)
        return extrs.reshape(-1, 6), errs.reshape(-1)

    extrs, errs = jax.vmap(lambda k: jax.vmap(lambda f: try_kf(k, f))(
        focals))(ks)
    # extrs (K, F, S*4, 6) -> flat; pair each with its (k, f)
    K, F, S4 = errs.shape
    flat_extr = extrs.reshape(-1, 6)
    flat_err = errs.reshape(-1)
    flat_f = jnp.broadcast_to(focals[None, :, None], (K, F, S4)).reshape(-1)
    flat_k = jnp.broadcast_to(ks[:, None, None], (K, F, S4)).reshape(-1)
    return flat_extr, flat_f, flat_k, flat_err


def _polish(world, image_px, extr, f, k0, num_radial, iters=15):
    """Joint GN over (extrinsics 6, focal, k1..k_nr) on all points.
    Residual in undistorted pixel space:
    f * project(R (X - c)) - px / (1 + k1 r^2 + k2 r^4 + k3 r^6)."""
    dtype = world.dtype
    r2 = jnp.sum(image_px ** 2, axis=-1)
    npar = 7 + num_radial
    p0 = jnp.concatenate([extr, f[None],
                          k0[None] if num_radial >= 1 else
                          jnp.zeros((0,), dtype),
                          jnp.zeros((max(num_radial - 1, 0),), dtype)])

    def residual(p):
        pc = rot.angle_axis_rotate_point(
            jnp.broadcast_to(p[3:6], world.shape), world - p[0:3])
        z = jnp.maximum(pc[:, 2], 1e-6)
        proj = pc[:, :2] / z[:, None] * p[6]
        w = jnp.ones_like(r2)
        rpow = r2
        for j in range(num_radial):
            w = w + p[7 + j] * rpow
            rpow = rpow * r2
        undist = image_px / w[:, None]
        return (proj - undist).reshape(-1)

    def step(_, p):
        r = residual(p)
        J = jax.jacfwd(residual)(p)
        JtJ = J.T @ J + 1e-8 * jnp.eye(npar, dtype=dtype)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        p_new = p - delta
        better = jnp.sum(residual(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p)

    p = jax.lax.fori_loop(0, iters, step, p0)
    return p, jnp.sum(residual(p) ** 2)


def four_point_focal_length_radial_distortion(
        world, image_px, focal_lo: float = 0.2, focal_hi: float = 5.0,
        dist_lo: float = -0.7, dist_hi: float = 0.15):
    """P4Pfr: pose + focal + one division-model distortion from 4
    2D-3D matches (ref FourPointsPoseFocalLengthRadialDistortion,
    four_point_focal_length_radial_distortion.h:55-71).

    world (4, 3); image_px (4, 2) DISTORTED pixels centered on the
    principal point. dist_lo/hi bound k * r_max^2.

    Returns (models (4, 8) [position(3), angle-axis(3), focal, k],
    valid (4,)). Projection convention: undistorted pixel
    u = f * proj(R (X - c)); distorted d satisfies u = d / (1 + k |d|^2).
    """
    flat_extr, flat_f, flat_k, flat_err = _sweep_candidates(
        world, image_px, focal_lo, focal_hi, dist_lo, dist_hi)
    order = jnp.argsort(flat_err)[:_MAX_MODELS]
    cand_valid = jnp.isfinite(flat_err[order])
    polished, costs = jax.vmap(
        lambda e, f, k: _polish(world, image_px, e, f, k, 1))(
        flat_extr[order], flat_f[order], flat_k[order])
    valid = cand_valid & (polished[:, 6] > 0) & \
        jnp.all(jnp.isfinite(polished), axis=-1)
    return polished, valid


def five_point_focal_length_radial_distortion(
        world, image_px, num_radial: int = 1,
        focal_lo: float = 0.2, focal_hi: float = 5.0,
        dist_lo: float = -0.7, dist_hi: float = 0.15):
    """P5Pfr: pose + focal + 1-3 division-model distortion parameters
    from 5 2D-3D matches (ref FivePointFocalLengthRadialDistortion,
    five_point_focal_length_radial_distortion.h:46-76; the reference
    returns up-to-scale projection matrices — here the calibrated
    decomposition [position, angle-axis, focal, k1..k_nr] directly).

    Returns (models (4, 7 + num_radial), valid (4,)).
    """
    assert num_radial in (1, 2, 3)
    flat_extr, flat_f, flat_k, flat_err = _sweep_candidates(
        world, image_px, focal_lo, focal_hi, dist_lo, dist_hi)
    order = jnp.argsort(flat_err)[:_MAX_MODELS]
    cand_valid = jnp.isfinite(flat_err[order])
    polished, costs = jax.vmap(
        lambda e, f, k: _polish(world, image_px, e, f, k, num_radial,
                                iters=20))(
        flat_extr[order], flat_f[order], flat_k[order])
    valid = cand_valid & (polished[:, 6] > 0) & \
        jnp.all(jnp.isfinite(polished), axis=-1)
    return polished, valid

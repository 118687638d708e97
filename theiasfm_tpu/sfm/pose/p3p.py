"""P3P — absolute pose from 3 world points + 3 calibrated rays.

ref: src/theia/sfm/pose/perspective_three_point.{h,cc} (Kneip's P3P).
This implementation solves the same problem via Grunert's classical
depth formulation (Haralick et al., IJCV 1994 review): the two ratio
equations between the three law-of-cosines constraints reduce to a
quartic in v = s3/s1, which we assemble NUMERICALLY with fixed-size
coefficient convolutions (trace-time polynomial algebra — no hand
expanded Groebner coefficients) and solve with the batched Aberth
finder. Each real root yields depths -> camera-frame points -> rigid
alignment (Horn) to world points. Up to 4 (R, t) solutions.

Engine format: solve(world (3,3), rays (3,2) normalized image coords)
-> (extrinsics [4, 6], valid [4]) with extrinsics = [position, angle-axis]
matching camera.models layout.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import polynomial as poly
from ...math import rotation as rot


def _conv(a, b):
    """Polynomial product, coefficient vectors highest-degree first."""
    return jnp.convolve(a, b)


def rigid_align(src, dst, weights=None):
    """Least-squares rigid transform: dst ~ R @ src + t (Horn/Umeyama,
    ref: sfm/transformation/align_point_clouds.h). src/dst (..., N, 3)."""
    if weights is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = weights
    sw = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / sw
    mu_d = jnp.sum(dst * w[..., None], axis=-2) / sw
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", dc * w[..., None], sc)
    U, _, Vt = jnp.linalg.svd(cov)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.ones(cov.shape[:-2] + (3,), cov.dtype).at[..., 2].set(d)
    R = (U * D[..., None, :]) @ Vt
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


def p3p_grunert(world, image):
    """world (3, 3); image (3, 2) normalized (undistorted, focal-removed).

    Returns (extrinsics (4, 6), valid (4,)).
    """
    dtype = world.dtype
    f = jnp.concatenate([image, jnp.ones((3, 1), dtype)], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # unit rays

    p1, p2, p3 = world[0], world[1], world[2]
    a = jnp.linalg.norm(p2 - p3)  # opposite vertex 1
    b = jnp.linalg.norm(p1 - p3)  # opposite vertex 2
    c = jnp.linalg.norm(p1 - p2)  # opposite vertex 3
    cos_al = jnp.dot(f[1], f[2])
    cos_be = jnp.dot(f[0], f[2])
    cos_ga = jnp.dot(f[0], f[1])

    b2 = jnp.maximum(b * b, 1e-15)
    A = (a * a) / b2
    C = (c * c) / b2

    # s2 = u s1, s3 = v s1. Ratio equations:
    #  eq1: u^2 + v^2 - 2 u v cos_al - A (1 + v^2 - 2 v cos_be) = 0
    #  eq2: 1 + u^2 - 2 u cos_ga - C (1 + v^2 - 2 v cos_be) = 0
    # eq1 - eq2 is linear in u:  u * 2(cos_ga - v cos_al) + N(v) = 0
    # with N(v) = v^2 - 1 - (A - C)(1 + v^2 - 2 v cos_be)
    # => u = N(v) / D(v),  D(v) = 2 (v cos_al - cos_ga)
    AC = A - C
    # N(v) coefficients (deg 2, highest first)
    Nv = jnp.stack([1.0 - AC, 2.0 * AC * cos_be, -1.0 - AC])
    Dv = jnp.stack([2.0 * cos_al, -2.0 * cos_ga])  # deg 1

    # Substitute u = N/D into eq2 multiplied by D^2:
    #   N^2 - 2 cos_ga N D + (1 - C - C v^2 + 2 C v cos_be) D^2 = 0
    Q = jnp.stack([-C, 2.0 * C * cos_be, 1.0 - C])  # deg-2 poly in v
    quart = (_conv(Nv, Nv)
             - 2.0 * cos_ga * jnp.pad(_conv(Nv, Dv), (1, 0))
             + _conv(Q, _conv(Dv, Dv)))  # degree 4 -> 5 coeffs

    roots = poly.poly_roots(quart, iters=60)
    real = poly.real_roots_mask(roots, rel_tol=1e-4, abs_tol=1e-7)
    v = jnp.real(roots)  # (4,)

    denom_u = 2.0 * (v * cos_al - cos_ga)
    u = poly.polyval(Nv, v) / jnp.where(jnp.abs(denom_u) < 1e-12, 1e-12,
                                        denom_u)
    s1_sq = b2 / jnp.maximum(1.0 + v * v - 2.0 * v * cos_be, 1e-15)
    s1 = jnp.sqrt(s1_sq)
    s2 = u * s1
    s3 = v * s1
    valid = real & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # camera-frame points, (4 solutions, 3 points, 3)
    depths = jnp.stack([s1, s2, s3], axis=-1)  # (4, 3)
    cam_pts = depths[..., None] * f[None, :, :]
    world_b = jnp.broadcast_to(world, cam_pts.shape)
    # camera extrinsics: p_cam = R (X - pos) -> align world->cam
    R, t = rigid_align(world_b, cam_pts)
    aa = rot.rotation_matrix_to_angle_axis(R)
    pos = -jnp.einsum("...ji,...j->...i", R, t)  # c = -R^T t
    extr = jnp.concatenate([pos, aa], axis=-1)  # (4, 6)
    return extr, valid

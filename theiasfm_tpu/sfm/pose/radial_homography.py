"""Two-sided radial-distortion homography (H6_l1l2).

ref: src/theia/sfm/pose/six_point_radial_distortion_homography.{h,cc} —
the 6-point two-sided radial homography solver of Kukelova et al.
(CVPR 2015, "Radial distortion homography"): a plane-induced homography
between two cameras that each follow the one-parameter division model,

    (x2, y2, 1 + l2 r2^2)^T  ~  H (x1, y1, 1 + l1 r1^2)^T ,

with r^2 the squared DISTORTED radius in normalized image coordinates.

TPU-shaped replacement for the reference's Groebner elimination: the
problem is linear in H once (l1, l2) are fixed, so sweep a 2-D grid
over [lmin, lmax]^2 — one batched SVD of 12x9 DLT matrices, scored by
the smallest singular value — then polish the best cells with a joint
Gauss-Newton over (H, l1, l2) on the algebraic constraints. On clean
data the polished minima are exact roots; the reference's H6 variant
returns 2 solutions, mirrored by `top` (default 2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["six_point_radial_distortion_homography",
           "radial_homography_symmetric_error_sq",
           "distort_division_homogeneous", "undistorted_homogeneous"]

_GRID = 14


def undistorted_homogeneous(x, l):
    """(N, 2) distorted normalized points -> (N, 3) undistorted
    homogeneous vectors (x, y, 1 + l r^2) of the division model."""
    r2 = jnp.sum(x ** 2, axis=-1)
    return jnp.concatenate([x, (1.0 + l * r2)[:, None]], axis=-1)


def distort_division_homogeneous(y, l):
    """Inverse of `undistorted_homogeneous`: map a homogeneous
    undistorted vector y (..., 3) to the distorted 2-D point d with
    (d, 1 + l |d|^2) ~ y. Solves t^2 - y_z t + l rho^2 = 0 for the
    scale t (rho^2 = y_x^2 + y_y^2), picking the root that tends to
    y_z as l -> 0."""
    rho2 = y[..., 0] ** 2 + y[..., 1] ** 2
    yz = y[..., 2]
    disc = jnp.sqrt(jnp.maximum(yz ** 2 - 4.0 * l * rho2, 0.0))
    # physical root has w = y_z / t > 0, i.e. t with the sign of y_z
    # (the division model maps 2 distorted radii to one ray; the other
    # root is the non-physical branch)
    sgn = jnp.where(yz < 0, -1.0, 1.0)
    t = 0.5 * (yz + sgn * disc)
    t = jnp.where(jnp.abs(t) < 1e-12, 1e-12 * sgn, t)
    return y[..., :2] / t[..., None]


def _dlt_matrix(x1, x2, l1, l2):
    """12x9 DLT matrix A with A h = 0 for h = vec(H) (row-major)."""
    u1 = undistorted_homogeneous(x1, l1)               # (6, 3)
    u2 = undistorted_homogeneous(x2, l2)               # (6, 3)
    z = jnp.zeros_like(u1)
    # rows: [-w2 u1, 0, x2 u1] and [0, -w2 u1, y2 u1]
    r1 = jnp.concatenate([-u2[:, 2:3] * u1, z, u2[:, 0:1] * u1], axis=-1)
    r2 = jnp.concatenate([z, -u2[:, 2:3] * u1, u2[:, 1:2] * u1], axis=-1)
    return jnp.concatenate([r1, r2], axis=0)           # (12, 9)


def _algebraic_residuals(h, l1, l2, x1, x2):
    u1 = undistorted_homogeneous(x1, l1)
    u2 = undistorted_homogeneous(x2, l2)
    H = h.reshape(3, 3)
    y = u1 @ H.T                                       # (N, 3)
    rA = u2[:, 0] * y[:, 2] - u2[:, 2] * y[:, 0]
    rB = u2[:, 1] * y[:, 2] - u2[:, 2] * y[:, 1]
    return jnp.concatenate([rA, rB])


def six_point_radial_distortion_homography(x1, x2, lmin: float = -2.0,
                                           lmax: float = 0.5,
                                           top: int = 2,
                                           gn_iters: int = 15):
    """x1, x2: (6, 2) distorted NORMALIZED image points (inv(K) * p,
    matching six_point_radial_distortion_homography.h:61-75).

    Returns (models, valid): models = {"H": (top, 3, 3), "l1": (top,),
    "l2": (top,)} with H scaled to unit Frobenius norm.
    """
    dtype = x1.dtype
    ls = jnp.linspace(lmin, lmax, _GRID, dtype=dtype)

    def cell(l1, l2):
        A = _dlt_matrix(x1, x2, l1, l2)
        _, s, Vt = jnp.linalg.svd(A, full_matrices=True)
        return Vt[-1], s[-1]

    hs, sigmas = jax.vmap(lambda l1: jax.vmap(lambda l2: cell(l1, l2))(
        ls))(ls)                                       # (G, G, 9), (G, G)
    flat_h = hs.reshape(-1, 9)
    flat_s = sigmas.reshape(-1)
    flat_l1 = jnp.broadcast_to(ls[:, None], (_GRID, _GRID)).reshape(-1)
    flat_l2 = jnp.broadcast_to(ls[None, :], (_GRID, _GRID)).reshape(-1)
    order = jnp.argsort(flat_s)[:top]

    def polish(h0, l1_0, l2_0):
        p0 = jnp.concatenate([h0, l1_0[None], l2_0[None]])

        def residual(p):
            alg = _algebraic_residuals(p[:9], p[9], p[10], x1, x2)
            gauge = jnp.sum(p[:9] ** 2) - 1.0
            return jnp.concatenate([alg, gauge[None]])

        def step(_, p):
            r = residual(p)
            J = jax.jacfwd(residual)(p)
            JtJ = J.T @ J + 1e-10 * jnp.eye(11, dtype=dtype)
            delta = jnp.linalg.solve(JtJ, J.T @ r)
            p_new = p - delta
            better = jnp.sum(residual(p_new) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, p_new, p)

        p = jax.lax.fori_loop(0, gn_iters, step, p0)
        return p, jnp.sum(_algebraic_residuals(
            p[:9], p[9], p[10], x1, x2) ** 2)

    ps, costs = jax.vmap(polish)(flat_h[order], flat_l1[order],
                                 flat_l2[order])
    Hs = ps[:, :9].reshape(-1, 3, 3)
    Hs = Hs / jnp.maximum(jnp.linalg.norm(Hs, axis=(1, 2),
                                          keepdims=True), 1e-12)
    valid = jnp.isfinite(costs) & jnp.all(jnp.isfinite(ps), axis=-1)
    return {"H": Hs, "l1": ps[:, 9], "l2": ps[:, 10]}, valid


def radial_homography_symmetric_error_sq(model, x1, x2):
    """Symmetric transfer error in distorted normalized coordinates
    (ref CheckRadialSymmetricError,
    six_point_radial_distortion_homography.h:86-90, with focal = 1).
    model = {"H", "l1", "l2"}; x1, x2 (N, 2). Returns (N,)."""
    H, l1, l2 = model["H"], model["l1"], model["l2"]
    u1 = undistorted_homogeneous(x1, l1)
    u2 = undistorted_homogeneous(x2, l2)
    fwd = u1 @ H.T                                     # predicted undist 2
    Hinv = jnp.linalg.inv(H + 1e-15 * jnp.eye(3, dtype=H.dtype))
    bwd = u2 @ Hinv.T                                  # predicted undist 1
    d2 = distort_division_homogeneous(fwd, l2)
    d1 = distort_division_homogeneous(bwd, l1)
    return (jnp.sum((d2 - x2) ** 2, axis=-1) +
            jnp.sum((d1 - x1) ** 2, axis=-1))

"""7-point fundamental matrix (up to 3 solutions).

ref: src/theia/sfm/pose/seven_point_fundamental_matrix.{h,cc}.
F = F1 + lam * F2 over the 2-dim nullspace of the 7x9 epipolar system;
det(F) = 0 gives a cubic in lam solved with the batched Aberth finder.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...math import polynomial as poly
from .eight_point import _epipolar_rows, _normalize_points


def _det3_poly(F1, F2):
    """Coefficients (highest first, degree 3) of det(F1 + lam F2)."""
    def det_mix(A, B, C):
        # sum over permutations with columns from A, B, C respectively
        return (A[..., 0, 0] * (B[..., 1, 1] * C[..., 2, 2] -
                                B[..., 2, 1] * C[..., 1, 2])
                - A[..., 1, 0] * (B[..., 0, 1] * C[..., 2, 2] -
                                  B[..., 2, 1] * C[..., 0, 2])
                + A[..., 2, 0] * (B[..., 0, 1] * C[..., 1, 2] -
                                  B[..., 1, 1] * C[..., 0, 2]))

    # det(F1 + t F2) = sum over column choices of det with columns from F1/F2
    c3 = det_mix(F2, F2, F2)
    c2 = (det_mix(F1, F2, F2) + det_mix(F2, F1, F2) + det_mix(F2, F2, F1))
    c1 = (det_mix(F1, F1, F2) + det_mix(F1, F2, F1) + det_mix(F2, F1, F1))
    c0 = det_mix(F1, F1, F1)
    return jnp.stack([c3, c2, c1, c0], axis=-1)


def seven_point_fundamental(x1, x2):
    """x1/x2 (7, 2) -> (F (3, 3, 3), valid (3,)). Engine-format minimal
    solver with max_models=3; invalid slots masked."""
    x1n, T1 = _normalize_points(x1)
    x2n, T2 = _normalize_points(x2)
    A = _epipolar_rows(x1n, x2n)  # (7, 9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    F1 = vecs[:, 0].reshape(3, 3)
    F2 = vecs[:, 1].reshape(3, 3)
    coeffs = _det3_poly(F1, F2)  # det(F1 + lam*F2), lam multiplies F2
    roots = poly.poly_roots(coeffs, iters=60)
    real = poly.real_roots_mask(roots, rel_tol=1e-4, abs_tol=1e-7)
    lam = jnp.real(roots)
    Fs = F1[None] + lam[:, None, None] * F2[None]
    Fs = jnp.swapaxes(T2, -1, -2)[None] @ Fs @ T1[None]
    norm = jnp.linalg.norm(Fs.reshape(3, 9), axis=-1)
    Fs = Fs / jnp.maximum(norm[:, None, None], 1e-12)
    valid = real & (norm > 1e-12)
    return Fs, valid

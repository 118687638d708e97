"""Normalized 8-point fundamental matrix (minimal + weighted N-point).

ref: src/theia/sfm/pose/eight_point_fundamental_matrix.{h,cc}
(Hartley-normalized DLT + rank-2 projection). TPU shape: nullspace via
eigh of the 9x9 normal matrix (self-adjoint eig is batchable on device,
unlike the thin SVD of a ragged Nx9 stack), weights fold in as W in
A^T W A so the SAME code is the minimal solver, the nonminimal
refinement, and the IRLS inner step.
"""
from __future__ import annotations

import jax.numpy as jnp


def _normalize_points(x, w=None):
    """Hartley normalization -> (x_norm, T) with T (3,3) s.t.
    x_norm = T @ [x;1]. Weighted centroid/scale if w given."""
    if w is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        d = jnp.linalg.norm(x - mean, axis=-1)
        scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d, axis=-1), 1e-12)
    else:
        sw = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
        mean = jnp.sum(x * w[..., None], axis=-2, keepdims=True) / sw[..., None, None]
        d = jnp.linalg.norm(x - mean, axis=-1)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sum(d * w, axis=-1) / sw, 1e-12)
    xn = (x - mean) * scale[..., None, None]
    T = jnp.zeros(x.shape[:-2] + (3, 3), x.dtype)
    T = T.at[..., 0, 0].set(scale).at[..., 1, 1].set(scale)
    T = T.at[..., 0, 2].set(-scale * mean[..., 0, 0])
    T = T.at[..., 1, 2].set(-scale * mean[..., 0, 1])
    T = T.at[..., 2, 2].set(1.0)
    return xn, T


def _epipolar_rows(x1, x2):
    """Rows a s.t. a . vec(F) = 0 for x2^T F x1 = 0. (..., N, 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                      u1, v1, one], axis=-1)


def npoint_fundamental(x1, x2, weights=None, enforce_rank2: bool = True):
    """Weighted N >= 8 point fundamental. x1/x2 (..., N, 2).

    Returns (F (..., 3, 3), ok (...,) bool)."""
    x1n, T1 = _normalize_points(x1, weights)
    x2n, T2 = _normalize_points(x2, weights)
    A = _epipolar_rows(x1n, x2n)
    if weights is not None:
        A = A * weights[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., :, 0]
    F = f.reshape(f.shape[:-1] + (3, 3))
    if enforce_rank2:
        U, s, Vt = jnp.linalg.svd(F)
        s = s.at[..., 2].set(0.0)
        F = (U * s[..., None, :]) @ Vt
    # denormalize: x2^T T2^T F T1 x1
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    ok = norm > 1e-12
    F = F / jnp.maximum(norm[..., None, None], 1e-12)
    return F, ok


def eight_point_fundamental(x1, x2):
    """Minimal 8-point solver in engine format: returns (F[1, 3, 3],
    valid[1])."""
    F, ok = npoint_fundamental(x1, x2)
    return F[None], ok[None]

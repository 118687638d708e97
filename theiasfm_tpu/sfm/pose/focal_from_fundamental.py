"""Focal length extraction from a fundamental matrix.

ref: src/theia/sfm/pose/fundamental_matrix_util.{h,cc}
(FocalLengthsFromFundamentalMatrix — Bougnoux formula) used by the
uncalibrated relative pose estimator
(estimate_uncalibrated_relative_pose.cc).
"""
from __future__ import annotations

import jax.numpy as jnp


def focal_lengths_from_fundamental(F, pp1, pp2):
    """Bougnoux closed form. F with x2^T F x1 = 0; principal points
    pp1/pp2 (2,). Returns (f1, f2, valid)."""
    p1 = jnp.concatenate([pp1, jnp.ones_like(pp1[..., :1])], -1)
    p2 = jnp.concatenate([pp2, jnp.ones_like(pp2[..., :1])], -1)

    # epipoles: e1 in image 1 (right null), e2 (left null)
    def null_vec(M):
        _, V = jnp.linalg.eigh(jnp.swapaxes(M, -1, -2) @ M)
        return V[..., :, 0]

    e1 = null_vec(F)
    e2 = null_vec(jnp.swapaxes(F, -1, -2))

    I2 = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], F.dtype))

    def f2_sq(F_, e_, pa, pb):
        # Bougnoux: f2^2 = -(p2' [e2]x I F p1)(p2' F' p2 scaled) form;
        # use the symmetric expression
        ex = jnp.asarray([[0, -e_[2], e_[1]],
                          [e_[2], 0, -e_[0]],
                          [-e_[1], e_[0], 0]], F_.dtype)
        num = -(pb @ ex @ I2 @ F_ @ pa) * (pb @ F_ @ pa)
        den = pb @ ex @ I2 @ F_ @ I2 @ F_.T @ pb
        return num / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)

    fa = f2_sq(F, e2, p1, p2)
    fb = f2_sq(jnp.swapaxes(F, -1, -2), e1, p2, p1)
    # empirically validated pairing for the x2^T F x1 = 0 convention:
    # fa belongs to image 1, fb to image 2
    f1s, f2s = fa, fb
    valid = (f1s > 0) & (f2s > 0)
    f1 = jnp.sqrt(jnp.maximum(f1s, 1e-12))
    f2 = jnp.sqrt(jnp.maximum(f2s, 1e-12))
    return f1, f2, valid

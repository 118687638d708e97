"""Batched polynomial root finding for minimal solvers.

TPU-native counterpart of the reference's root finders
(ref: src/theia/math/closed_form_polynomial_solver.h,
src/theia/math/find_polynomial_roots_jenkins_traub.h,
src/theia/math/find_polynomial_roots_companion_matrix.h).

The reference uses sequential Jenkins-Traub / LAPACK companion-matrix
eigensolves per call. Neither maps to XLA/TPU (non-symmetric eig is
unsupported on device, and data-dependent iteration counts break
tracing). Instead we use the Aberth–Ehrlich simultaneous iteration: a
fixed number of vectorized complex Newton-like updates that converge
to ALL roots at once — fully batched, static shapes, vmappable, and
the per-root updates are pure VPU element-wise math.

Conventions: coefficient vectors are highest-degree-first, matching the
reference (`coeffs[0] x^n + ... + coeffs[n]`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "solve_quadratic", "solve_cubic", "solve_quartic",
    "poly_roots", "polyval", "real_roots_mask", "char_poly",
]


def char_poly(A):
    """Characteristic polynomial of (..., n, n) -> (..., n+1) monic
    coefficients, highest degree first, via the Faddeev-LeVerrier
    recurrence (n matmuls — MXU-friendly, no nonsymmetric eig).

    Combined with `poly_roots` this replaces the reference's LAPACK
    companion-matrix eigensolves for tiny dense eigenproblems (e.g. QEP
    linearizations in the partial-rotation solvers,
    ref: src/theia/sfm/pose/three_point_relative_pose_partial_rotation.cc:61-141).
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    coeffs = [jnp.ones(A.shape[:-2], A.dtype)]
    Mk = jnp.zeros_like(A)
    ck = coeffs[0]
    for k in range(1, n + 1):
        Mk = A @ (Mk + ck[..., None, None] * eye)
        ck = -jnp.trace(Mk, axis1=-2, axis2=-1) / k
        coeffs.append(ck)
    return jnp.stack(coeffs, axis=-1)


def polyval(coeffs, x):
    """Horner evaluation. coeffs (..., D+1) highest-first, x (...)."""
    out = jnp.zeros_like(x) + coeffs[..., 0]
    for i in range(1, coeffs.shape[-1]):
        out = out * x + coeffs[..., i]
    return out


def solve_quadratic(a, b, c):
    """Roots of a x^2 + b x + c. Returns complex (..., 2).

    Citardauq/stable form: q = -(b + sign(b) sqrt(disc)) / 2;
    roots are q/a and c/q, avoiding catastrophic cancellation
    (same stability trick as ref closed_form_polynomial_solver.h).
    """
    a, b, c = jnp.broadcast_arrays(a, b, c)
    ac = _to_complex(a)
    bc = _to_complex(b)
    cc = _to_complex(c)
    disc = jnp.sqrt(bc * bc - 4 * ac * cc)
    sgn = jnp.where(jnp.real(jnp.conj(bc) * disc) >= 0, 1.0, -1.0)
    q = -0.5 * (bc + sgn * disc)
    safe_a = jnp.where(ac == 0, 1.0, ac)
    safe_q = jnp.where(q == 0, 1.0, q)
    r1 = q / safe_a
    r2 = cc / safe_q
    # Degenerate a==0: single root -c/b duplicated.
    lin = -cc / jnp.where(bc == 0, 1.0, bc)
    r1 = jnp.where(ac == 0, lin, r1)
    r2 = jnp.where(ac == 0, lin, r2)
    return jnp.stack([r1, r2], axis=-1)


def solve_cubic(a, b, c, d):
    """Roots of a x^3 + b x^2 + c x + d. Complex (..., 3) (trig/Cardano)."""
    a, b, c, d = jnp.broadcast_arrays(a, b, c, d)
    coeffs = jnp.stack([a, b, c, d], axis=-1)
    return poly_roots(coeffs, iters=40)


def solve_quartic(a, b, c, d, e):
    """Roots of a x^4 + b x^3 + c x^2 + d x + e. Complex (..., 4)."""
    a, b, c, d, e = jnp.broadcast_arrays(a, b, c, d, e)
    coeffs = jnp.stack([a, b, c, d, e], axis=-1)
    return poly_roots(coeffs, iters=48)


def _to_complex(x):
    cdtype = jnp.complex128 if jnp.asarray(x).dtype == jnp.float64 else jnp.complex64
    return jnp.asarray(x).astype(cdtype)


def poly_roots(coeffs, iters: int = 80):
    """All complex roots of a dense polynomial, batched.

    Aberth–Ehrlich simultaneous iteration with Cauchy-bound initialization
    on a slightly irrational spiral (breaks symmetry so conjugate pairs
    don't stall). Fixed `iters` (default 80 ≈ overkill for degree <= 10;
    converges quadratically once near the roots).

    Args:
      coeffs: (..., D+1) real or complex, highest-degree first. Leading
        coefficient should be nonzero (guarded internally; a zero leading
        coeff yields large spurious roots which callers mask via
        `real_roots_mask` / domain checks).
      iters: static iteration count.
    Returns:
      (..., D) complex roots.
    """
    coeffs = _to_complex(coeffs) if not jnp.iscomplexobj(coeffs) else coeffs
    D = coeffs.shape[-1] - 1
    lead = coeffs[..., :1]
    lead = jnp.where(jnp.abs(lead) < 1e-30, 1e-30 + 0j, lead)
    monic = coeffs / lead  # (..., D+1), monic[...,0] == 1

    # Cauchy bound: 1 + max |a_i|  (roots lie within this radius).
    radius = 1.0 + jnp.max(jnp.abs(monic[..., 1:]), axis=-1, keepdims=True)
    k = jnp.arange(D, dtype=jnp.float32)
    # Spiral init: distinct angles, slight radius ramp.
    angles = 2.0 * jnp.pi * k / D + 0.4
    ring = (0.5 * radius) * jnp.exp(1j * angles) * (1.0 + 0.08 * k / max(D, 1))
    z0 = ring.astype(monic.dtype)

    dcoef = monic[..., :-1] * jnp.arange(D, 0, -1, dtype=monic.real.dtype)

    def body(_, z):
        p = _polyval_c(monic, z)      # (..., D)
        dp = _polyval_c(dcoef, z)
        newton = p / jnp.where(dp == 0, 1e-30 + 0j, dp)
        # Pairwise repulsion sum_{j!=i} 1/(z_i - z_j)
        diff = z[..., :, None] - z[..., None, :]
        diff = jnp.where(jnp.eye(D, dtype=bool), 1.0 + 0j, diff)
        inv = 1.0 / jnp.where(jnp.abs(diff) < 1e-30, 1e-30 + 0j, diff)
        repulse = jnp.sum(inv * (1.0 - jnp.eye(D, dtype=inv.real.dtype)), axis=-1)
        denom = 1.0 - newton * repulse
        step = newton / jnp.where(jnp.abs(denom) < 1e-30, 1e-30 + 0j, denom)
        # Clamp runaway steps to the Cauchy radius to keep iteration stable.
        step_mag = jnp.abs(step)
        max_step = 2.0 * radius
        step = jnp.where(step_mag[...] > max_step,
                         step * (max_step / jnp.where(step_mag == 0, 1.0, step_mag)),
                         step)
        return z - step

    roots = jax.lax.fori_loop(0, iters, body, z0)
    return roots


def _polyval_c(coeffs, z):
    out = jnp.zeros_like(z) + coeffs[..., :1]
    for i in range(1, coeffs.shape[-1]):
        out = out * z + coeffs[..., i:i + 1]
    return out


def real_roots_mask(roots, rel_tol: float = 1e-5, abs_tol: float = 1e-8):
    """Boolean mask of roots that are (numerically) real."""
    return jnp.abs(jnp.imag(roots)) <= (abs_tol + rel_tol * jnp.abs(roots))

"""5-point relative pose (essential matrix), up to 10 solutions.

ref: src/theia/sfm/pose/five_point_relative_pose.{h,cc} (Nister's
method: nullspace + Groebner elimination + 10th-degree polynomial).

TPU-native formulation (same math, different machinery):
  1. 4-dim nullspace of the 5x9 epipolar system via eigh of A^T A.
  2. E(x,y,z) = x E1 + y E2 + z E3 + E4. The 10 cubic constraints
     (det E = 0 and E E^T E - 0.5 tr(E E^T) E = 0) are expanded over
     the 20 degree-<=3 monomials SYMBOLICALLY AT TRACE TIME by a tiny
     dict-based trivariate polynomial algebra — producing exactly the
     same 10x20 coefficient matrix the Groebner-generated C code
     hardcodes, but derived on the fly.
  3. Gauss-Jordan via jnp.linalg.solve -> 10x10 action matrix for
     multiplication by z (Stewenius et al. 2006 formulation).
  4. Eigenvalues of the action matrix WITHOUT non-symmetric eig
     (unsupported on TPU): characteristic polynomial via the
     Faddeev-LeVerrier recurrence (pure 10x10 matmuls -> MXU) of the
     INF-NORM-SCALED action matrix (unscaled, the coefficients reach
     ~1e8 and the Aberth spiral radius overflows f32 -> NaN roots; on
     the chip that silently discarded most solutions), roots via the
     batched Aberth finder, eigenvectors via damped inverse iteration
     on (A - z I)^T (A - z I) (two batched 10x10 solves; a per-root
     eigh here cost ~40% of the whole 5-pt RANSAC dispatch on TPU).

Measured on one v5e at 8192 solves (the 256-hypothesis x 32-pair
verification batch): 3161 ms -> 759 ms, and the fraction of problems
yielding at least one solution that interpolates its five defining
points rose 0.38 -> 0.91 (f32; the old path NaN'd most char-polys).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...math import polynomial as poly

# Monomial ordering (degree-3 Stewenius basis split):
_ELIM = [(3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
         (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3)]
_BASIS = [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
          (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_MONOMIALS = _ELIM + _BASIS
_MONO_IDX = {m: i for i, m in enumerate(_MONOMIALS)}


def _pmul(p, q):
    """Product of trivariate polys as {(i,j,k): coeff} dicts."""
    out = {}
    for ma, ca in p.items():
        for mb, cb in q.items():
            m = (ma[0] + mb[0], ma[1] + mb[1], ma[2] + mb[2])
            out[m] = out.get(m, 0.0) + ca * cb
    return out


def _padd(p, q, sign=1.0):
    out = dict(p)
    for m, c in q.items():
        out[m] = out.get(m, 0.0) + sign * c
    return out


def _pscale(p, s):
    return {m: c * s for m, c in p.items()}


def _constraint_rows(E1, E2, E3, E4):
    """Build the (10, 20) coefficient matrix of the 10 cubic constraints.

    The symbolic expansion happens in Python at trace time; XLA sees a
    flat arithmetic graph over the nullspace entries.
    """
    # E[i][j] as degree-1 polynomial in (x, y, z)
    Ep = [[{(1, 0, 0): E1[i, j], (0, 1, 0): E2[i, j],
            (0, 0, 1): E3[i, j], (0, 0, 0): E4[i, j]}
           for j in range(3)] for i in range(3)]

    def mat_mul(A, B):
        return [[_padd(_padd(_pmul(A[i][0], B[0][j]),
                             _pmul(A[i][1], B[1][j])),
                       _pmul(A[i][2], B[2][j]))
                 for j in range(3)] for i in range(3)]

    Et = [[Ep[j][i] for j in range(3)] for i in range(3)]
    EEt = mat_mul(Ep, Et)
    trace = _padd(_padd(EEt[0][0], EEt[1][1]), EEt[2][2])
    EEtE = mat_mul(EEt, Ep)

    rows = []
    # det(E) = 0
    det = {}
    det = _padd(det, _pmul(Ep[0][0], _padd(_pmul(Ep[1][1], Ep[2][2]),
                                           _pmul(Ep[1][2], Ep[2][1]),
                                           sign=-1.0)))
    det = _padd(det, _pmul(Ep[0][1], _padd(_pmul(Ep[1][2], Ep[2][0]),
                                           _pmul(Ep[1][0], Ep[2][2]),
                                           sign=-1.0)))
    det = _padd(det, _pmul(Ep[0][2], _padd(_pmul(Ep[1][0], Ep[2][1]),
                                           _pmul(Ep[1][1], Ep[2][0]),
                                           sign=-1.0)))
    rows.append(det)
    # E E^T E - 0.5 tr(E E^T) E = 0 (9 equations)
    for i in range(3):
        for j in range(3):
            rows.append(_padd(EEtE[i][j],
                              _pmul(_pscale(trace, 0.5), Ep[i][j]),
                              sign=-1.0))

    M = []
    for r in rows:
        coeffs = [r.get(m, jnp.zeros((), E1.dtype)) for m in _MONOMIALS]
        M.append(jnp.stack([jnp.asarray(c, E1.dtype) for c in coeffs]))
    return jnp.stack(M)  # (10, 20)


def _char_poly(A):
    """Characteristic polynomial coefficients [1, c1, ..., cn] (monic,
    highest first) via Faddeev-LeVerrier — n matmuls, MXU-friendly."""
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    coeffs = [jnp.ones((), A.dtype)]
    Mk = jnp.zeros_like(A)
    ck = jnp.ones((), A.dtype)
    for k in range(1, n + 1):
        Mk = A @ (Mk + ck * eye)
        ck = -jnp.trace(Mk) / k
        coeffs.append(ck)
    return jnp.stack(coeffs)


def five_point_essential(x1, x2, aberth_iters: int = 40,
                         inv_iters: int = 3, polish_iters: int = 4):
    """x1/x2 (5, 2) normalized image coords -> (E (10, 3, 3), valid (10,)).

    Convention: x2h^T E x1h = 0.
    """
    dtype = x1.dtype
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                   u1, v1, one], axis=-1)  # (5, 9)
    # nullspace of A: trailing columns of the complete QR of A^T
    # (2.4x cheaper than eigh(A^T A) on TPU at RANSAC batch sizes)
    Q = jnp.linalg.qr(A.T, mode="complete")[0]
    E1 = Q[:, 5].reshape(3, 3)
    E2 = Q[:, 6].reshape(3, 3)
    E3 = Q[:, 7].reshape(3, 3)
    E4 = Q[:, 8].reshape(3, 3)

    M = _constraint_rows(E1, E2, E3, E4)
    # Gauss-Jordan: [I | B], guarded against singular leading block
    lead = M[:, :10]
    det_ok = jnp.abs(jnp.linalg.det(lead)) > 1e-18
    lead_safe = jnp.where(det_ok, 1.0, 0.0) * lead + \
        jnp.where(det_ok, 0.0, 1.0) * jnp.eye(10, dtype=dtype)
    B = jnp.linalg.solve(lead_safe, M[:, 10:])  # (10, 10)

    # action matrix for multiplication by z in basis _BASIS
    rows = []
    elim_for_basis = {0: 2, 1: 4, 2: 5, 3: 7, 4: 8, 5: 9}
    basis_for_shift = {6: 2, 7: 4, 8: 5, 9: 8}  # z*x=xz, z*y=yz, z*z=z2, z*1=z
    for bi in range(10):
        if bi in elim_for_basis:
            rows.append(-B[elim_for_basis[bi]])
        else:
            e = jnp.zeros(10, dtype)
            rows.append(e.at[basis_for_shift[bi]].set(1.0))
    Az = jnp.stack(rows)  # (10, 10)

    # Similarity-scale before the char poly: eigenvalues of Az/s are
    # bounded by 1 in inf-norm, so the char-poly coefficients stay
    # f32-representable (unscaled they reach ~1e8 and the Aberth
    # initialization radius ** 10 overflows f32 to NaN).
    s = jnp.maximum(jnp.max(jnp.sum(jnp.abs(Az), axis=1)), 1e-12)
    cp = _char_poly(Az / s)
    roots = poly.poly_roots(cp, iters=aberth_iters)
    real = poly.real_roots_mask(roots, rel_tol=1e-3, abs_tol=1e-6)
    z = jnp.real(roots) * s  # (10,)

    # eigenvectors: null direction of (Az - z I). In f64 (CPU host
    # paths + the unit-test lane) use the exact smallest eigenvector
    # of G^T G — it recovers the ground-truth root basin essentially
    # at the char-poly accuracy ceiling. In f32 (the TPU production
    # dtype) per-root eigh was ~40% of the whole verification
    # dispatch, and measured ground-truth recovery is limited by f32
    # ROOT accuracy, not eigenvector accuracy (inv-iteration vs eigh
    # scored identically on-chip) — so use damped inverse iteration
    # (batched 10x10 solves, ~5x cheaper). The constraint polish
    # below re-converges (x, y, z) on the actual cubic system either
    # way.
    exact_nullvec = dtype == jnp.float64

    def null_vec(zi):
        G = Az - zi * jnp.eye(10, dtype=dtype)
        GtG = G.T @ G
        if exact_nullvec:
            _, V = jnp.linalg.eigh(GtG)
            return V[:, 0]
        H = GtG + (1e-6 * jnp.trace(GtG) / 10.0) * \
            jnp.eye(10, dtype=dtype)
        v = jnp.full((10,), 1.0 / jnp.sqrt(10.0), dtype)
        for _ in range(inv_iters):
            v = jnp.linalg.solve(H, v[:, None])[:, 0]
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        return v

    vs = jax.vmap(null_vec)(z)  # (10, 10)
    denom = vs[:, 9]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    xs = vs[:, 6] / denom
    ys = vs[:, 7] / denom
    zs = vs[:, 8] / denom

    # Polish (x, y, z) with Gauss-Newton on the 10 cubic constraints
    # evaluated numerically — recovers machine precision lost to the
    # char-poly conditioning of the eigen route.
    def constraints(xyz):
        E = (xyz[0] * E1 + xyz[1] * E2 + xyz[2] * E3 + E4)
        EEt = E @ E.T
        c_trace = (EEt @ E - 0.5 * jnp.trace(EEt) * E).reshape(9)
        return jnp.concatenate([jnp.linalg.det(E)[None], c_trace])

    def polish(xyz):
        def step(_, p):
            r = constraints(p)
            J = jax.jacfwd(constraints)(p)
            JtJ = J.T @ J + 1e-12 * jnp.eye(3, dtype=dtype)
            delta = jnp.linalg.solve(JtJ, J.T @ r)
            p_new = p - delta
            better = jnp.sum(constraints(p_new) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, p_new, p)
        return jax.lax.fori_loop(0, polish_iters, step, xyz)

    xyz = jax.vmap(polish)(jnp.stack([xs, ys, zs], axis=-1))
    xs, ys, zs = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    Es = (xs[:, None, None] * E1[None] + ys[:, None, None] * E2[None] +
          zs[:, None, None] * E3[None] + E4[None])
    norm = jnp.linalg.norm(Es.reshape(10, 9), axis=-1)
    Es = Es / jnp.maximum(norm[:, None, None], 1e-12)
    valid = real & det_ok & (norm > 1e-12)
    return Es, valid

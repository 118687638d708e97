"""Gauss-Jordan elimination (partial pivoting), jit/vmap-friendly.

ref: src/theia/math/matrix/gauss_jordan.h — row-reduces a (possibly
rectangular) matrix in place with partial pivoting; the reference uses
it to build UPnP action matrices. TPU-native version: fixed-shape
fori_loop over pivot columns, whole-matrix row updates (vectorized over
the trailing axis), safe to vmap over a batch of matrices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_jordan(A: jnp.ndarray, max_rows: int | None = None
                 ) -> jnp.ndarray:
    """Reduced row-echelon form of A (rows, cols >= rows).

    Pivots on the first `rows` columns (like the reference, which
    eliminates the leading square block and leaves the tail columns
    reduced). `max_rows` limits elimination to the top-left block as in
    the reference's partial elimination overload (gauss_jordan.h).
    Singular pivots are guarded with a tiny epsilon; callers that need
    rank detection should check the diagonal magnitude themselves.
    """
    rows, cols = A.shape
    n = rows if max_rows is None else min(max_rows, rows)
    dtype = A.dtype

    def body(j, M):
        col = M[:, j]
        # partial pivoting: largest |value| at/below row j
        masked = jnp.where(jnp.arange(rows) >= j, jnp.abs(col), -1.0)
        p = jnp.argmax(masked)
        # swap rows j and p
        rj, rp = M[j], M[p]
        M = M.at[j].set(rp).at[p].set(rj)
        piv = M[j, j]
        piv = jnp.where(jnp.abs(piv) < 1e-30,
                        jnp.asarray(1e-30, dtype), piv)
        Mj = M[j] / piv
        M = M.at[j].set(Mj)
        # eliminate column j from every other row
        factors = M[:, j].at[j].set(0.0)
        return M - factors[:, None] * Mj[None, :]

    return jax.lax.fori_loop(0, n, body, A.astype(dtype))

"""Brute-force descriptor matching on the MXU.

ref: src/theia/matching/brute_force_feature_matcher.{h,cc} (all-pairs
L2 + Lowe's ratio + optional symmetric check). On TPU the all-pairs
distance matrix IS the fast path: one (N1, D) x (D, N2) matmul on the
systolic array — for SIFT-scale descriptor counts this beats any
bucketed scheme the CPU reference needs. Distances via
||a||^2 + ||b||^2 - 2 a.b; top-2 via lax.top_k for the ratio test.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("lowes_ratio", "symmetric"))
def match_descriptors(desc1, desc2, mask1=None, mask2=None,
                      lowes_ratio: float = 0.8, symmetric: bool = True):
    """Match desc1 (N1, D) -> desc2 (N2, D).

    Returns (idx2 (N1,) int32 best match per query, valid (N1,) bool,
    dist (N1,) squared L2 of best match). Invalid rows (mask False or
    failing ratio/symmetry) have valid=False.
    """
    n1 = jnp.sum(desc1 * desc1, axis=-1, keepdims=True)   # (N1, 1)
    n2 = jnp.sum(desc2 * desc2, axis=-1, keepdims=True).T  # (1, N2)
    d2 = n1 + n2 - 2.0 * jnp.dot(desc1, desc2.T,
                                 preferred_element_type=jnp.float32)
    d2 = jnp.maximum(d2, 0.0)
    big = jnp.asarray(jnp.inf, d2.dtype)
    if mask2 is not None:
        d2 = jnp.where(mask2[None, :], d2, big)

    # top-2 smallest distances (negate for top_k)
    neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    idx2 = idx_top2[:, 0].astype(jnp.int32)
    ratio_ok = best < (lowes_ratio ** 2) * second
    valid = ratio_ok & jnp.isfinite(best)
    if mask1 is not None:
        valid = valid & mask1

    if symmetric:
        if mask1 is not None:
            d2r = jnp.where(mask1[:, None], d2, big)
        else:
            d2r = d2
        rev_best = jnp.argmin(d2r, axis=0).astype(jnp.int32)  # (N2,)
        valid = valid & (rev_best[idx2] == jnp.arange(
            desc1.shape[0], dtype=jnp.int32))
    return idx2, valid, best


@partial(jax.jit, static_argnames=("lowes_ratio", "symmetric"))
def match_descriptors_batch(desc1, desc2, mask1, mask2,
                            lowes_ratio: float = 0.8,
                            symmetric: bool = True):
    """vmapped pair matching: desc1 (P, N1, D), desc2 (P, N2, D) —
    the batched replacement for the reference's thread-pool chunks of
    <=20 pairs (feature_matcher.h:135)."""
    return jax.vmap(
        lambda a, b, m1, m2: match_descriptors(
            a, b, m1, m2, lowes_ratio=lowes_ratio, symmetric=symmetric)
    )(desc1, desc2, mask1, mask2)

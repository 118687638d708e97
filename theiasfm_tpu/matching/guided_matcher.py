"""Guided epipolar matching: grow verified matches along epipolar lines.

ref: src/theia/matching/guided_epipolar_matcher.{h,cc} — after two-view
geometry is known, unmatched features are matched against candidates
near their epipolar line (the reference builds flann KD-trees on grid
cells; guided_epipolar_matcher.cc:375).

TPU shape: compute ALL pairwise point-to-epipolar-line distances in one
(N1, N2) batched op, mask to a band, then run ratio-test matching on
the distance-masked descriptor products — dense ops instead of
KD-trees.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("lowes_ratio",))
def guided_epipolar_matching(F, kp1, kp2, desc1, desc2, mask1, mask2,
                             matched1, matched2,
                             band_pixels: float = 4.0,
                             lowes_ratio: float = 0.9):
    """Match yet-unmatched features constrained to the epipolar band.

    F (3, 3) fundamental (x2^T F x1 = 0) in PIXEL coords; kp (N, 2);
    desc (N, D); matchedX (N,) bool marks features already matched.
    Returns (idx2 (N1,), valid (N1,)).
    """
    one1 = jnp.ones_like(kp1[:, :1])
    one2 = jnp.ones_like(kp2[:, :1])
    x1h = jnp.concatenate([kp1, one1], -1)
    x2h = jnp.concatenate([kp2, one2], -1)
    # epipolar lines of kp1 in image 2: l = F x1
    lines = x1h @ F.T                          # (N1, 3)
    denom = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2 + 1e-12)
    dist = jnp.abs(lines @ x2h.T) / denom[:, None]   # (N1, N2)

    d2 = (jnp.sum(desc1 * desc1, -1, keepdims=True) +
          jnp.sum(desc2 * desc2, -1)[None, :] -
          2.0 * desc1 @ desc2.T)
    big = jnp.asarray(jnp.inf, d2.dtype)
    usable2 = mask2 & ~matched2
    d2 = jnp.where((dist <= band_pixels) & usable2[None, :], d2, big)

    neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    idx2 = idx_top2[:, 0].astype(jnp.int32)
    valid = (best < (lowes_ratio ** 2) * second) & jnp.isfinite(best) & \
        mask1 & ~matched1
    return idx2, valid

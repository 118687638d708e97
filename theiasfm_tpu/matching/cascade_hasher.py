"""Cascade hashing for fast descriptor matching (TPU formulation).

ref: src/theia/matching/cascade_hasher.{h,cc} — the CVPR-2014 cascade
hashing pipeline: 128-bit primary binary hash (random Gaussian
projections of mean-centered descriptors) + bucket groups for candidate
selection, candidates ranked by Hamming distance then verified by L2 +
Lowe ratio (constants cascade_hasher.h:51-58).

TPU reshaping: the bucket lookup (ragged hash tables) becomes a DENSE
Hamming-distance matrix over bit-packed uint32 words — XOR + popcount
on the VPU, 32x less data movement than float distances — followed by
top-K candidate selection and exact L2 verification restricted to the
K candidates (a (N1, K, D) gather + einsum on the MXU). Same
prefilter-then-verify semantics, dense fixed shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NUM_HASH_BITS = 128  # ref kHashCodeSize (cascade_hasher.h:51-58)


class CascadeHasher:
    """Stateful hasher: holds the random projection basis (generated
    once, like ref CascadeHasher::Initialize) and the dataset mean."""

    def __init__(self, num_dimensions: int = 128, seed: int = 0,
                 num_candidates: int = 10):
        key = jax.random.PRNGKey(seed)
        self.proj = jax.random.normal(
            key, (num_dimensions, NUM_HASH_BITS), dtype=jnp.float32)
        self.num_candidates = num_candidates

    def hash_descriptors(self, desc, mean):
        """desc (N, D) -> packed bits (N, 4) uint32."""
        return _hash_pack(desc, mean, self.proj)

    def match(self, desc1, desc2, mean, mask1=None, mask2=None,
              lowes_ratio: float = 0.8):
        """Hamming-prefiltered matching. Returns (idx2, valid, dist)."""
        h1 = self.hash_descriptors(desc1, mean)
        h2 = self.hash_descriptors(desc2, mean)
        return _cascade_match(desc1, desc2, h1, h2,
                              mask1 if mask1 is not None else
                              jnp.ones(desc1.shape[0], bool),
                              mask2 if mask2 is not None else
                              jnp.ones(desc2.shape[0], bool),
                              self.num_candidates, lowes_ratio)


@jax.jit
def _hash_pack(desc, mean, proj):
    bits = (desc - mean[None, :]) @ proj > 0  # (N, 128) bool
    words = bits.reshape(desc.shape[0], 4, 32)
    weights = (2 ** jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(words.astype(jnp.uint32) * weights[None, None, :],
                   axis=-1)  # (N, 4) uint32


@partial(jax.jit, static_argnames=("num_candidates", "lowes_ratio"))
def _cascade_match(desc1, desc2, h1, h2, mask1, mask2,
                   num_candidates: int, lowes_ratio: float):
    # Hamming distance matrix via XOR + popcount over 4 words
    x = h1[:, None, :] ^ h2[None, :, :]            # (N1, N2, 4)
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    ham = jnp.where(mask2[None, :], ham, 1 << 30)

    # top-K candidates by Hamming
    _, cand = jax.lax.top_k(-ham, num_candidates)   # (N1, K)
    cand_desc = desc2[cand]                         # (N1, K, D)
    diff = desc1[:, None, :] - cand_desc
    d2 = jnp.sum(diff * diff, axis=-1)              # (N1, K)
    cand_valid = jnp.take_along_axis(
        jnp.broadcast_to(mask2[None, :], ham.shape), cand, axis=1)
    d2 = jnp.where(cand_valid, d2, jnp.inf)

    neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    idx2 = jnp.take_along_axis(cand, idx_top2[:, :1], axis=1)[:, 0]
    ratio_ok = best < (lowes_ratio ** 2) * second
    valid = ratio_ok & jnp.isfinite(best) & mask1
    return idx2.astype(jnp.int32), valid, best

"""Pallas fused matcher vs the jnp reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from theiasfm_tpu.matching import match_descriptors
from theiasfm_tpu.matching.pallas_matcher import match_descriptors_pallas


def test_pallas_matcher_matches_reference(rng):
    d1 = rng.normal(size=(300, 128)).astype(np.float32)
    perm = rng.permutation(300)
    d2 = (d1[perm] + 0.01 *
          rng.normal(size=d1.shape).astype(np.float32))
    idx_p, valid_p, best_p = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), interpret=True)
    idx_r, valid_r, best_r = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), symmetric=False)
    idx_p, idx_r = np.asarray(idx_p), np.asarray(idx_r)
    valid_p, valid_r = np.asarray(valid_p), np.asarray(valid_r)
    # same matches wherever both are valid; overall agreement high
    assert (valid_p == valid_r).mean() > 0.98
    both = valid_p & valid_r
    assert (idx_p[both] == idx_r[both]).all()
    np.testing.assert_allclose(np.asarray(best_p)[both],
                               np.asarray(best_r)[both], atol=1e-3)


def test_pallas_matcher_mask2(rng):
    d1 = rng.normal(size=(64, 32)).astype(np.float32)
    d2 = np.concatenate([d1, d1])  # duplicates in second half
    mask2 = np.zeros(128, bool)
    mask2[:64] = True
    idx, valid, best = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), mask2=jnp.asarray(mask2),
        interpret=True)
    idx = np.asarray(idx)
    # with the duplicate half masked, each row matches its own copy
    assert (idx == np.arange(64)).all()


def test_pallas_batched_matches_reference(rng):
    from theiasfm_tpu.matching.pallas_matcher import (
        match_descriptors_pallas_batch)
    B, N, D = 3, 200, 128
    d1 = rng.normal(size=(B, N, D)).astype(np.float32)
    d2 = np.stack([d1[b][rng.permutation(N)] for b in range(B)])
    d2 += 0.01 * rng.normal(size=d2.shape).astype(np.float32)
    m1 = np.ones((B, N), bool)
    m2 = np.ones((B, N), bool)
    m2[1, 150:] = False  # ragged pair
    idx_b, valid_b, best_b = match_descriptors_pallas_batch(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1),
        jnp.asarray(m2), symmetric=True, interpret=True)
    for b in range(B):
        idx_r, valid_r, best_r = match_descriptors(
            jnp.asarray(d1[b]), jnp.asarray(d2[b]),
            mask1=jnp.asarray(m1[b]), mask2=jnp.asarray(m2[b]),
            symmetric=True)
        vb = np.asarray(valid_b[b]); vr = np.asarray(valid_r)
        assert (vb == vr).mean() > 0.97, b
        both = vb & vr
        assert (np.asarray(idx_b[b])[both] ==
                np.asarray(idx_r)[both]).all(), b

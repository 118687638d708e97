"""AKAZE tests — detection + translation matching repeatability (same
harness as the SIFT tests; ref akaze_descriptor capability)."""
import numpy as np
import jax.numpy as jnp

from tests.test_sift import make_test_image
from theiasfm_tpu.image.akaze import AkazeOptions, extract_akaze
from theiasfm_tpu.matching import match_descriptors

OPTS = AkazeOptions(num_octaves=3, max_features_per_octave=256)


def test_akaze_detects(rng):
    img = make_test_image(rng)
    kps, desc, valid = extract_akaze(img, OPTS)
    n = valid.sum()
    assert n > 40, n
    norms = np.linalg.norm(desc[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_akaze_translation_matching(rng):
    img = make_test_image(rng)
    shift = 16
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    kp1, d1, v1 = extract_akaze(img, OPTS)
    kp2, d2, v2 = extract_akaze(img2, OPTS)
    idx2, valid, _ = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), mask1=jnp.asarray(v1),
        mask2=jnp.asarray(v2), lowes_ratio=0.85)
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    sel = np.nonzero(valid)[0]
    assert len(sel) > 20, len(sel)
    d = kp2[idx2[sel], :2] - kp1[sel, :2]
    good = (np.abs(d - shift) < 2.0).all(axis=-1)
    assert good.mean() > 0.7, good.mean()

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


def test_fed_tau_schedule_properties():
    """FED cycle: taus sum exactly to T, early steps exceed tau_max
    (super-stable), n matches the Grewenig cycle-length formula
    (ref vendored akaze fed.cpp fed_tau_by_cycle_time)."""
    import math
    import numpy as np
    from theiasfm_tpu.image.akaze import _fed_tau_schedule

    for T in (0.3, 1.0, 4.7, 12.0):
        taus = _fed_tau_schedule(T, 0.25)
        assert abs(taus.sum() - T) < 1e-9 * max(T, 1)
        n = len(taus)
        assert n >= math.ceil(math.sqrt(3 * T / 0.25 + 0.25) - 0.5 - 1e-6)
        assert np.all(taus > 0)
        # the largest step in a multi-step cycle exceeds the single-step
        # stability limit — the whole point of FED
        if n > 2:
            assert taus.max() > 0.25

"""SIFT tests — detection repeatability and descriptor matching under
translation/rotation (the invariances ref vlfeat SIFT provides to the
pipeline; ref sift_descriptor_test.cc checks similar properties)."""
import numpy as np
import pytest
from scipy import ndimage

from theiasfm_tpu.image import SiftOptions, extract_sift
from theiasfm_tpu.matching import match_descriptors

import jax.numpy as jnp


def make_test_image(rng, size=256):
    """Smooth random blob image with rich gradients."""
    img = rng.normal(size=(size, size))
    img = ndimage.gaussian_filter(img, 4.0)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


OPTS = SiftOptions(num_octaves=3, max_features_per_octave=256)


def test_sift_detects_features(rng):
    img = make_test_image(rng)
    kps, desc, valid = extract_sift(img, OPTS)
    n = valid.sum()
    assert n > 50, n
    # keypoints inside image, descriptors normalized
    assert (kps[valid, 0] >= 0).all() and (kps[valid, 0] < 256).all()
    norms = np.linalg.norm(desc[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_sift_translation_repeatability(rng):
    img = make_test_image(rng)
    shift = 16
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    kps1, desc1, v1 = extract_sift(img, OPTS)
    kps2, desc2, v2 = extract_sift(img2, OPTS)
    idx2, valid, _ = match_descriptors(
        jnp.asarray(desc1), jnp.asarray(desc2),
        mask1=jnp.asarray(v1), mask2=jnp.asarray(v2))
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    sel = np.nonzero(valid)[0]
    assert len(sel) > 30, len(sel)
    d = kps2[idx2[sel], :2] - kps1[sel, :2]
    # most matches displaced by exactly (shift, shift)
    good = (np.abs(d - shift) < 1.5).all(axis=-1)
    assert good.mean() > 0.8, good.mean()


def test_sift_rotation_matching(rng):
    img = make_test_image(rng)
    img2 = ndimage.rotate(img, 30.0, reshape=False, order=3,
                          mode="reflect").astype(np.float32)
    kps1, desc1, v1 = extract_sift(img, OPTS)
    kps2, desc2, v2 = extract_sift(img2, OPTS)
    idx2, valid, _ = match_descriptors(
        jnp.asarray(desc1), jnp.asarray(desc2),
        mask1=jnp.asarray(v1), mask2=jnp.asarray(v2),
        lowes_ratio=0.85)
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    sel = np.nonzero(valid)[0]
    assert len(sel) > 15, len(sel)
    # verify matches against the known rotation about the image center
    c = np.array([127.5, 127.5])
    th = np.radians(-30.0)
    # scipy.ndimage.rotate rotates CCW in array coords; map kp1 -> kp2
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    pred = (kps1[sel, :2] - c) @ R.T + c
    err = np.linalg.norm(pred - kps2[idx2[sel], :2], axis=-1)
    assert np.median(err) < 3.0, np.median(err)


def test_extract_sift_batch_matches_single(rng):
    """Batched (vmapped) extraction must match per-image extraction."""
    from theiasfm_tpu.image.sift import (SiftOptions, extract_sift,
                                         extract_sift_batch)
    import numpy as np
    imgs = []
    for i in range(3):
        img = np.zeros((96, 128), np.float32)
        r = np.random.default_rng(i)
        for _ in range(12):
            y, x = r.integers(12, 84), r.integers(12, 116)
            img[y - 3:y + 3, x - 3:x + 3] = r.uniform(0.5, 1.0)
        imgs.append(img)
    opts = SiftOptions()
    batch = extract_sift_batch(imgs, opts)
    for im, (kb, db_, vb) in zip(imgs, batch):
        ks, ds, vs = extract_sift(im, opts)
        np.testing.assert_array_equal(vb, vs)
        np.testing.assert_allclose(kb[vb], ks[vs], atol=1e-4)
        np.testing.assert_allclose(db_[vb], ds[vs], atol=1e-4)


def test_root_sift_and_upright(rng):
    from theiasfm_tpu.image.sift import SiftOptions, extract_sift
    import numpy as np
    img = np.zeros((96, 128), np.float32)
    r = np.random.default_rng(5)
    for _ in range(12):
        y, x = r.integers(12, 84), r.integers(12, 116)
        img[y - 3:y + 3, x - 3:x + 3] = r.uniform(0.5, 1.0)
    k1, d1, v1 = extract_sift(img, SiftOptions(root_sift=True,
                                               upright=True))
    # RootSIFT: descriptors are L2-normalized sqrt-L1 vectors
    norms = np.linalg.norm(d1[v1], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert (d1[v1] >= 0).all()
    # upright: thetas are all zero
    assert np.allclose(k1[v1][:, 3], 0.0)

"""Quantified SIFT parity on the reference's own test images
(VERDICT round-2 item #4).

The reference ships vlfeat SIFT (src/theia/image/descriptor/
sift_descriptor.cc:105-127); its binary features are not
re-extractable here (no vlfeat build), so parity is gated on the
standard repeatability metric vlfeat-class detectors achieve on real
imagery: keypoint repeatability and descriptor match precision under
known warps of data/image/img1.png. Measured on this implementation
(2026-08, ROADMAP.md): repeatability 0.83-0.84 @3px for 15/30-degree
rotations, match precision 0.98-0.99, ~600 verified matches from ~950
keypoints — vlfeat-class performance; thresholds below leave margin.
"""
import numpy as np
import pytest
from scipy import ndimage
from scipy.spatial import cKDTree

import jax.numpy as jnp

from theiasfm_tpu.image import SiftOptions, extract_sift
from theiasfm_tpu.matching import match_descriptors

IMG = "/root/reference/data/image/img1.png"
OPTS = SiftOptions(num_octaves=4, max_features_per_octave=512)


def _load():
    from PIL import Image
    img = np.asarray(Image.open(IMG).convert("L"), np.float32) / 255.0
    return img


@pytest.mark.parametrize("angle", [15, 30])
def test_rotation_repeatability_real_image(angle):
    img = _load()
    kps1, desc1, v1 = extract_sift(img, OPTS)
    assert int(v1.sum()) > 500, int(v1.sum())
    img2 = ndimage.rotate(img, angle, reshape=False, order=3,
                          mode="constant", cval=0.0)
    kps2, desc2, v2 = extract_sift(img2.astype(np.float32), OPTS)

    c = np.array([img.shape[1] / 2 - 0.5, img.shape[0] / 2 - 0.5])
    th = -np.deg2rad(angle)
    R = np.array([[np.cos(th), -np.sin(th)],
                  [np.sin(th), np.cos(th)]])
    p1 = (kps1[:, :2] - c) @ R.T + c
    inside = ((p1[:, 0] > 10) & (p1[:, 0] < img.shape[1] - 10) &
              (p1[:, 1] > 10) & (p1[:, 1] < img.shape[0] - 10) &
              np.asarray(v1))
    tree = cKDTree(kps2[np.asarray(v2), :2])
    d, _ = tree.query(p1[inside])
    repeatability = (d < 3.0).mean()
    assert repeatability >= 0.70, (angle, repeatability)

    idx2, valid, _ = match_descriptors(
        jnp.asarray(desc1), jnp.asarray(desc2),
        mask1=jnp.asarray(v1), mask2=jnp.asarray(v2))
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    sel = np.nonzero(valid)[0]
    assert len(sel) >= 300, len(sel)
    err = np.linalg.norm(np.asarray(kps2)[idx2[sel], :2] - p1[sel],
                         axis=-1)
    precision = (err < 3.0).mean()
    assert precision >= 0.90, (angle, precision)


def test_scale_repeatability_real_image():
    """0.75x downscale: keypoints must re-detect at shifted octave."""
    img = _load()
    kps1, desc1, v1 = extract_sift(img, OPTS)
    s = 0.75
    img2 = ndimage.zoom(img, s, order=3).astype(np.float32)
    kps2, desc2, v2 = extract_sift(img2, OPTS)
    p1 = kps1[:, :2] * s
    inside = ((p1[:, 0] > 10) & (p1[:, 0] < img2.shape[1] - 10) &
              (p1[:, 1] > 10) & (p1[:, 1] < img2.shape[0] - 10) &
              np.asarray(v1))
    tree = cKDTree(kps2[np.asarray(v2), :2])
    d, _ = tree.query(p1[inside])
    repeatability = (d < 3.0).mean()
    assert repeatability >= 0.5, repeatability

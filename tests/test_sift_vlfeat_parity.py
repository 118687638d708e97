"""Ground-truth SIFT parity against the reference's ACTUAL frontend:
the vendored vlfeat C library, compiled from
/root/reference/libraries/vlfeat behind native/vlfeat_oracle.c
(round-3 verdict item #5 — the previous parity gates measured only
self-repeatability under synthetic warps).

Gates on the reference's own test image (data/image/img1.png):
  * keypoint repeatability: >= 0.6 of repo keypoints have a vlfeat
    keypoint within 3 px (threshold from the verdict);
  * coverage: >= 0.45 of vlfeat keypoints have a repo keypoint within
    3 px (vlfeat finds more small-scale detections at its extra
    levels; measured 0.56);
  * descriptor agreement: mean cosine >= 0.85 between repo and vlfeat
    descriptors on spatially (1.5 px) + orientation (0.2 rad) matched
    keypoints — both use the (y, x, orientation) bin layout
    (measured 0.95).

Skips if the oracle .so is absent (build: make -C native vlfeat).
"""
import ctypes
import os

import numpy as np
import pytest
from scipy.spatial import cKDTree

from theiasfm_tpu.image import SiftOptions, extract_sift
from theiasfm_tpu.image.float_image import load_gray

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libvlfeat_oracle.so")
IMG = "/root/reference/data/image/img1.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE),
    reason="vlfeat oracle not built (make -C native vlfeat)")


def _vlfeat_extract(img, first_octave=0, peak=1.2 / 255,
                    edge=10.0 / 255, upright=1, max_kp=20000):
    """Extract with the reference's defaults (sift_parameters.h:62-72,
    DetectAndExtractDescriptors flow sift_descriptor.cc:216-280)."""
    lib = ctypes.CDLL(ORACLE)
    lib.vlfeat_sift_extract.restype = ctypes.c_int
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    kp = np.zeros((max_kp, 4), np.float32)
    desc = np.zeros((max_kp, 128), np.float32)
    n = lib.vlfeat_sift_extract(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w, h, -1, 3, first_octave,
        ctypes.c_double(peak), ctypes.c_double(edge),
        ctypes.c_int(upright),
        kp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_kp)
    assert n > 0
    return kp[:n], desc[:n]


@pytest.fixture(scope="module")
def extracted():
    img = load_gray(IMG).astype(np.float32)
    vkp, vdesc = _vlfeat_extract(img)
    kps, ds, valid = extract_sift(
        img, SiftOptions(num_octaves=4, max_features_per_octave=1024))
    valid = np.asarray(valid)
    return vkp, vdesc, np.asarray(kps)[valid], np.asarray(ds)[valid]


def test_keypoint_repeatability_vs_vlfeat(extracted):
    vkp, _, kps, _ = extracted
    assert len(kps) > 800
    assert len(vkp) > 800
    d, _ = cKDTree(vkp[:, :2]).query(kps[:, :2])
    rep = (d < 3.0).mean()
    assert rep >= 0.6, rep


def test_keypoint_coverage_of_vlfeat(extracted):
    vkp, _, kps, _ = extracted
    d, _ = cKDTree(kps[:, :2]).query(vkp[:, :2])
    cov = (d < 3.0).mean()
    assert cov >= 0.45, cov


def test_descriptor_agreement_vs_vlfeat(extracted):
    vkp, vdesc, kps, ds = extracted
    d, idx = cKDTree(vkp[:, :2]).query(kps[:, :2])
    m = d < 1.5
    th_o = kps[m, 3]
    th_v = vkp[idx[m], 3]
    dth = np.abs(((th_o - th_v + np.pi) % (2 * np.pi)) - np.pi)
    close = dth < 0.2
    assert close.sum() > 300, close.sum()
    a = ds[m][close]
    b = vdesc[idx[m]][close]
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-9)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-9)
    cos = (a * b).sum(1)
    assert cos.mean() >= 0.85, cos.mean()
    # and the match is discriminative: the spatially-correct vlfeat
    # descriptor must be the nearest neighbor for most repo
    # descriptors (cross-implementation NN consistency)
    sub = np.random.default_rng(0).choice(len(a), size=min(300, len(a)),
                                          replace=False)
    sims = a[sub] @ b.T
    nn_ok = (sims.argmax(1) == sub).mean()
    assert nn_ok >= 0.7, nn_ok

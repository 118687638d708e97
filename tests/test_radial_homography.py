"""Radial-distortion homography (H6_l1l2) tests.

ref: src/theia/sfm/pose/six_point_radial_distortion_homography_test.cc:
synthetic plane-induced homography between two division-model cameras,
distort projections, recover (H, l1, l2); plus the RANSAC estimator
(ref estimate_radial_distortion_homography_test.cc).
"""
import numpy as np
import jax
import jax.numpy as jnp

from theiasfm_tpu.sfm.pose.radial_homography import (
    distort_division_homogeneous, radial_homography_symmetric_error_sq,
    six_point_radial_distortion_homography, undistorted_homogeneous)
from theiasfm_tpu.sfm.estimators import (
    estimate_radial_distortion_homography)
from theiasfm_tpu.solvers import RansacOptions


def _make_pair(rng, n, H, l1, l2):
    """Generate distorted correspondences consistent with
    (x2,y2,1+l2 r2^2) ~ H (x1,y1,1+l1 r1^2)."""
    x1 = rng.uniform(-0.5, 0.5, size=(n, 2))
    u1 = np.asarray(undistorted_homogeneous(jnp.asarray(x1), l1))
    y = u1 @ H.T
    x2 = np.asarray(distort_division_homogeneous(jnp.asarray(y), l2))
    return x1, x2


def _h_err(Ha, Hb):
    Ha = Ha / np.linalg.norm(Ha)
    Hb = Hb / np.linalg.norm(Hb)
    return min(np.linalg.norm(Ha - Hb), np.linalg.norm(Ha + Hb))


class TestSixPoint:
    def test_noise_free(self):
        rng = np.random.default_rng(31)
        found = 0
        for trial in range(5):
            H = np.eye(3) + 0.25 * rng.normal(size=(3, 3))
            l1, l2 = rng.uniform(-1.2, -0.1, 2)
            x1, x2 = _make_pair(rng, 6, H, l1, l2)
            models, valid = six_point_radial_distortion_homography(
                jnp.asarray(x1), jnp.asarray(x2))
            ok = False
            for i in range(len(np.asarray(valid))):
                if not np.asarray(valid)[i]:
                    continue
                m = {"H": models["H"][i], "l1": models["l1"][i],
                     "l2": models["l2"][i]}
                err = np.asarray(radial_homography_symmetric_error_sq(
                    m, jnp.asarray(x1), jnp.asarray(x2)))
                if (err.max() < 1e-8
                        and abs(float(m["l1"]) - l1) < 0.05
                        and abs(float(m["l2"]) - l2) < 0.05):
                    ok = True
            found += ok
        assert found >= 4

    def test_identity_no_distortion(self):
        rng = np.random.default_rng(37)
        H = np.eye(3)
        x1, x2 = _make_pair(rng, 6, H, 0.0, 0.0)
        models, valid = six_point_radial_distortion_homography(
            jnp.asarray(x1), jnp.asarray(x2))
        best = None
        for i in range(len(np.asarray(valid))):
            m = {"H": models["H"][i], "l1": models["l1"][i],
                 "l2": models["l2"][i]}
            err = np.asarray(radial_homography_symmetric_error_sq(
                m, jnp.asarray(x1), jnp.asarray(x2))).max()
            if best is None or err < best[0]:
                best = (err, m)
        assert best[0] < 1e-8


class TestRansacEstimator:
    def test_with_outliers(self):
        rng = np.random.default_rng(41)
        H = np.eye(3) + 0.2 * rng.normal(size=(3, 3))
        l1, l2 = -0.6, -0.3
        n_in, n_out = 60, 20
        x1, x2 = _make_pair(rng, n_in, H, l1, l2)
        x1o = rng.uniform(-0.5, 0.5, size=(n_out, 2))
        x2o = rng.uniform(-0.5, 0.5, size=(n_out, 2))
        X1 = np.concatenate([x1, x1o])
        X2 = np.concatenate([x2, x2o])
        opts = RansacOptions(num_hypotheses=256,
                             error_thresh=1e-3)
        out = estimate_radial_distortion_homography(
            jax.random.PRNGKey(0), jnp.asarray(X1), jnp.asarray(X2), opts)
        inl = np.asarray(out["inliers"])
        assert inl[:n_in].sum() >= n_in * 0.9
        assert inl[n_in:].sum() <= n_out * 0.2

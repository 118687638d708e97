"""gDLS similarity-transform tests.

Mirrors the reference's synthetic test
(ref: src/theia/sfm/transformation/gdls_similarity_transform_test.cc):
random similarity (R, t, s), multi-camera rays hitting the transformed
points, recover, compare.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.pose.gdls import gdls_similarity_transform


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def _random_pose(rng):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0, np.pi * 0.9)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    t = rng.normal(size=3)
    return R, t


class TestGdls:
    @pytest.mark.parametrize("n", [4, 6, 20])
    def test_noise_free(self, n):
        rng = np.random.default_rng(7)
        for trial in range(5):
            R, t = _random_pose(rng)
            s = rng.uniform(0.3, 3.0)
            pts = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
            # a few distinct camera centers (generalized camera)
            origins = rng.uniform(-0.5, 0.5, size=(n, 3))
            # residual convention (gdls_similarity_transform.cc:204):
            # R X + t - s o must be parallel to the ray direction
            dirs = pts @ R.T + t - s * origins
            depths = np.linalg.norm(dirs, axis=1)
            assert (depths > 0.5).all()
            dirs = dirs / depths[:, None]
            Re, te, se, cost = gdls_similarity_transform(origins, dirs, pts)
            Re, te = np.asarray(Re), np.asarray(te)
            assert _rot_err_deg(R, Re) < 1e-4
            assert np.linalg.norm(te - t) < 1e-4
            assert abs(float(se) - s) < 1e-5
            assert float(cost) < 1e-10

    def test_noisy_rays(self):
        rng = np.random.default_rng(11)
        R, t = _random_pose(rng)
        s = 1.7
        n = 50
        pts = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 8.0])
        origins = rng.uniform(-0.5, 0.5, size=(n, 3))
        dirs = pts @ R.T + t - s * origins
        dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
        dirs = dirs + rng.normal(scale=1e-3, size=dirs.shape)
        dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
        Re, te, se, cost = gdls_similarity_transform(origins, dirs, pts)
        assert _rot_err_deg(R, np.asarray(Re)) < 0.5
        assert np.linalg.norm(np.asarray(te) - t) < 0.1
        assert abs(float(se) - s) < 0.05


class TestSimilarityEstimator2d3d:
    def test_ransac_with_outliers(self):
        import jax
        from theiasfm_tpu.sfm.estimators import (
            estimate_similarity_transform_2d_3d)
        from theiasfm_tpu.solvers import RansacOptions
        rng = np.random.default_rng(13)
        R, t = _random_pose(rng)
        s = 2.1
        n_in, n_out = 60, 20
        pts = rng.uniform(-2, 2, size=(n_in + n_out, 3)) + \
            np.array([0, 0, 8.0])
        origins = rng.uniform(-0.5, 0.5, size=(n_in + n_out, 3))
        dirs = pts @ R.T + t - s * origins
        dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
        bad = rng.normal(size=(n_out, 3))
        dirs[n_in:] = bad / np.linalg.norm(bad, axis=1, keepdims=True)
        opts = RansacOptions(num_hypotheses=64, error_thresh=1e-6)
        out = estimate_similarity_transform_2d_3d(
            jax.random.PRNGKey(3), jnp.asarray(origins),
            jnp.asarray(dirs), jnp.asarray(pts), opts)
        inl = np.asarray(out["inliers"])
        assert inl[:n_in].sum() >= n_in * 0.9
        assert abs(float(out["scale"]) - s) < 0.05
        assert _rot_err_deg(R, np.asarray(out["R"])) < 0.5

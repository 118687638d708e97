"""UPnP / DLS-PnP tests.

Mirrors the reference's synthetic tests
(ref: src/theia/sfm/pose/upnp_test.cc, dls_pnp_test.cc): random pose,
project points, recover, compare.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.pose.upnp import upnp, dls_pnp


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def _random_pose(rng):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0, np.pi * 0.9)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    t = rng.normal(size=3)
    return R, t


class TestDlsPnp:
    @pytest.mark.parametrize("n", [4, 6, 20])
    def test_noise_free(self, n):
        rng = np.random.default_rng(5)
        for _ in range(5):
            R, t = _random_pose(rng)
            pts = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
            # place the camera so points are in front: cam = R p + t
            cam = pts @ R.T + t
            cam += np.array([0, 0, 10.0]) - cam.mean(0).clip(max=0)
            t_adj = t + (cam - (pts @ R.T + t))[0]
            cam = pts @ R.T + t_adj
            assert (cam[:, 2] > 0).all()
            feats = cam[:, :2] / cam[:, 2:3]
            Re, te, cost = dls_pnp(feats, pts)
            Re, te = np.asarray(Re), np.asarray(te)
            assert _rot_err_deg(R, Re) < 1e-4
            assert np.linalg.norm(te - t_adj) < 1e-5
            assert float(cost) < 1e-12

    def test_with_noise(self):
        rng = np.random.default_rng(9)
        R, t = _random_pose(rng)
        pts = rng.uniform(-2, 2, size=(30, 3)) + np.array([0, 0, 8.0])
        cam = pts @ R.T + t
        cam[:, 2] = np.abs(cam[:, 2]) + 4.0
        # consistent geometry: recompute world points from camera points
        pts = (cam - t) @ R
        feats = cam[:, :2] / cam[:, 2:3]
        feats += rng.normal(scale=1e-3, size=feats.shape)
        Re, te, _ = dls_pnp(feats, pts)
        assert _rot_err_deg(R, np.asarray(Re)) < 0.5
        assert np.linalg.norm(np.asarray(te) - t) < 0.05


class TestUpnp:
    @pytest.mark.parametrize("n", [4, 8])
    def test_noncentral_noise_free(self, n):
        rng = np.random.default_rng(13)
        for _ in range(5):
            R, t = _random_pose(rng)
            pts = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
            origins = rng.uniform(-0.3, 0.3, size=(n, 3))
            cam = pts @ R.T + t
            dirs = cam - origins
            depths = np.linalg.norm(dirs, axis=1)
            assert (depths > 0.5).all()
            dirs = dirs / depths[:, None]
            Re, te, cost = upnp(origins, dirs, pts)
            Re, te = np.asarray(Re), np.asarray(te)
            assert _rot_err_deg(R, Re) < 1e-4
            assert np.linalg.norm(te - t) < 1e-5
            assert float(cost) < 1e-12

    def test_central_matches_dls(self):
        rng = np.random.default_rng(21)
        R, t = _random_pose(rng)
        pts = rng.uniform(-2, 2, size=(10, 3)) + np.array([0, 0, 6.0])
        cam = pts @ R.T + t
        cam[:, 2] = np.abs(cam[:, 2]) + 3.0
        pts = (cam - t) @ R
        rays = cam / np.linalg.norm(cam, axis=1, keepdims=True)
        Re, te, cost = upnp(np.zeros_like(rays), rays, pts)
        assert _rot_err_deg(R, np.asarray(Re)) < 1e-4
        assert np.linalg.norm(np.asarray(te) - t) < 1e-5

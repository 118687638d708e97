"""Partial-rotation (gravity-aware) solver tests.

Mirrors the reference's synthetic-noise test pattern
(ref: src/theia/sfm/pose/two_point_pose_partial_rotation_test.cc,
three_point_relative_pose_partial_rotation_test.cc,
four_point_relative_pose_partial_rotation_test.cc,
sim_transform_partial_rotation_test.cc).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.pose.partial_rotation import (
    two_point_pose_partial_rotation,
    three_point_relative_pose_partial_rotation,
    four_point_relative_pose_partial_rotation,
    sim_transform_partial_rotation,
)


def _axis_angle_R(axis, angle):
    return np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(axis) * angle))


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestTwoPointPose:
    @pytest.mark.parametrize("angle", [0.0, 0.3, -1.2, 2.5])
    def test_exact(self, angle):
        rng = np.random.default_rng(42)
        axis = np.array([0.0, 1.0, 0.0])
        R = _axis_angle_R(axis, angle)
        t = rng.normal(size=3)
        pts = rng.uniform(-1, 1, size=(2, 3)) + np.array([0, 0, 5.0])
        cam_pts = pts @ R.T + t
        rays = cam_pts / np.linalg.norm(cam_pts, axis=1, keepdims=True)

        Rs, ts, valid = two_point_pose_partial_rotation(axis, pts, rays)
        Rs, ts, valid = np.asarray(Rs), np.asarray(ts), np.asarray(valid)
        assert valid.any()
        best = min(_rot_err_deg(R, Rs[i]) + np.linalg.norm(t - ts[i])
                   for i in range(2) if valid[i])
        assert best < 5e-4

    def test_random_axes(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            R = _axis_angle_R(axis, rng.uniform(-np.pi, np.pi))
            t = rng.normal(size=3)
            pts = rng.uniform(-1, 1, size=(2, 3)) + np.array([0, 0, 6.0])
            cam = pts @ R.T + t
            rays = cam / np.linalg.norm(cam, axis=1, keepdims=True)
            Rs, ts, valid = two_point_pose_partial_rotation(axis, pts, rays)
            Rs, ts, valid = map(np.asarray, (Rs, ts, valid))
            assert valid.any()
            errs = [_rot_err_deg(R, Rs[i]) + np.linalg.norm(t - ts[i])
                    for i in range(2) if valid[i]]
            assert min(errs) < 5e-4


class TestThreePointRelativePose:
    @pytest.mark.parametrize("angle", [0.4, -0.9, 2.0])
    def test_exact(self, angle):
        rng = np.random.default_rng(3)
        axis = np.array([0.0, 1.0, 0.0])
        R = _axis_angle_R(axis, angle)
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        X = rng.uniform(-1, 1, size=(3, 3)) + np.array([0, 0, 5.0])
        rays1 = X / np.linalg.norm(X, axis=1, keepdims=True)
        X2 = X @ R.T + t
        rays2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)

        Rs, ts, valid = three_point_relative_pose_partial_rotation(
            axis, rays1, rays2)
        Rs, ts, valid = map(np.asarray, (Rs, ts, valid))
        assert valid.any()
        errs = [_rot_err_deg(R, Rs[i]) + np.linalg.norm(t - ts[i])
                for i in range(len(valid)) if valid[i]]
        assert min(errs) < 1e-5

    def test_zero_rotation_fallback(self):
        rng = np.random.default_rng(11)
        axis = np.array([0.0, 1.0, 0.0])
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        X = rng.uniform(-1, 1, size=(3, 3)) + np.array([0, 0, 5.0])
        rays1 = X / np.linalg.norm(X, axis=1, keepdims=True)
        X2 = X + t
        rays2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
        Rs, ts, valid = three_point_relative_pose_partial_rotation(
            axis, rays1, rays2)
        Rs, ts, valid = map(np.asarray, (Rs, ts, valid))
        assert valid.any()
        errs = [_rot_err_deg(np.eye(3), Rs[i]) + np.linalg.norm(t - ts[i])
                for i in range(len(valid)) if valid[i]]
        assert min(errs) < 1e-5


class TestFourPointRelativePose:
    @pytest.mark.parametrize("angle", [0.5, -1.0, 2.2])
    def test_exact(self, angle):
        rng = np.random.default_rng(61)
        axis = np.array([0.0, 1.0, 0.0])
        R = _axis_angle_R(axis, angle)
        t = rng.normal(size=3)
        X = rng.uniform(-2, 2, size=(4, 3)) + np.array([0, 0, 6.0])
        o1 = rng.uniform(-0.5, 0.5, size=(4, 3))
        o2 = rng.uniform(-0.5, 0.5, size=(4, 3))
        d1 = X - o1
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        X2 = X @ R.T + t
        d2 = X2 - o2
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

        Rs, ts, valid = four_point_relative_pose_partial_rotation(
            axis, d1, o1, d2, o2)
        Rs, ts, valid = map(np.asarray, (Rs, ts, valid))
        assert valid.any()
        errs = [_rot_err_deg(R, Rs[i]) + np.linalg.norm(t - ts[i])
                for i in range(len(valid)) if valid[i]]
        assert min(errs) < 1e-5


class TestSimTransform:
    @pytest.mark.parametrize("angle,scale", [(0.6, 1.0), (-1.1, 2.5),
                                             (1.8, 0.4)])
    def test_exact(self, angle, scale):
        rng = np.random.default_rng(60)
        axis = np.array([0.0, 1.0, 0.0])
        R = _axis_angle_R(axis, angle)
        t = rng.normal(size=3)
        X = rng.uniform(-2, 2, size=(5, 3)) + np.array([0, 0, 8.0])
        o1 = rng.uniform(-1, 1, size=(5, 3))
        v2 = rng.uniform(-1, 1, size=(5, 3))  # view-2 centers (frame 1)
        d1 = X - o1
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        # frame 2 quantities: X = scale * R * X2 + t
        o2 = (v2 - t) @ R / scale
        d2 = (X - v2) / np.linalg.norm(X - v2, axis=1, keepdims=True) @ R

        Rs, ts, ss, valid = sim_transform_partial_rotation(
            axis, d1, o1, d2, o2)
        Rs, ts, ss, valid = map(np.asarray, (Rs, ts, ss, valid))
        assert valid.any()
        errs = [_rot_err_deg(R, Rs[i]) + np.linalg.norm(t - ts[i])
                + abs(ss[i] - scale) / scale
                for i in range(len(valid)) if valid[i]]
        assert min(errs) < 1e-4

    def test_zero_rotation_fallback(self):
        rng = np.random.default_rng(8)
        axis = np.array([0.0, 1.0, 0.0])
        R = np.eye(3)
        t = rng.normal(size=3)
        scale = 1.7
        X = rng.uniform(-2, 2, size=(5, 3)) + np.array([0, 0, 8.0])
        o1 = rng.uniform(-1, 1, size=(5, 3))
        v2 = rng.uniform(-1, 1, size=(5, 3))
        d1 = X - o1
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        o2 = (v2 - t) @ R / scale
        d2 = (X - v2) / np.linalg.norm(X - v2, axis=1, keepdims=True) @ R
        Rs, ts, ss, valid = sim_transform_partial_rotation(
            axis, d1, o1, d2, o2)
        Rs, ts, ss, valid = map(np.asarray, (Rs, ts, ss, valid))
        assert valid.any()
        errs = [_rot_err_deg(R, Rs[i]) + np.linalg.norm(t - ts[i])
                + abs(ss[i] - scale) / scale
                for i in range(len(valid)) if valid[i]]
        assert min(errs) < 1e-4

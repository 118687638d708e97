"""P4Pfr / P5Pfr tests.

ref: src/theia/sfm/pose/four_point_focal_length_radial_distortion_test.cc
and five_point_focal_length_radial_distortion_test.cc: random pose +
focal + division-model distortion, project, distort, recover.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.pose.pnp_focal_radial import (
    four_point_focal_length_radial_distortion,
    five_point_focal_length_radial_distortion)


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def _distort_division(u, k):
    """Forward division-model distortion: find d with u = d/(1+k|d|^2)."""
    r_u = np.linalg.norm(u, axis=-1)
    disc = np.sqrt(np.maximum(1.0 - 4.0 * k * r_u ** 2, 0.0))
    r_d = (1.0 - disc) / np.maximum(2.0 * k * r_u, -1e30) \
        if k != 0 else r_u
    return u * (r_d / np.maximum(r_u, 1e-12))[:, None]


def _make_scene(rng, n, f, k):
    aa = rng.normal(size=3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0.1, 1.0)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    c = rng.normal(size=3) * 0.5
    # points in the frustum, moderate field of view
    pc = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(4.0, 9.0, n)], axis=1)
    world = pc @ R + c                       # X = R^T pc + c
    u = f * pc[:, :2] / pc[:, 2:3]           # undistorted pixels
    d = _distort_division(u, k)
    return world, d, (c, aa, R)


class TestP4Pfr:
    @pytest.mark.parametrize("k", [-2e-7, -8e-7])
    def test_noise_free(self, k):
        rng = np.random.default_rng(17)
        f = 800.0
        found = 0
        for trial in range(6):
            world, px, (c, aa, R) = _make_scene(rng, 4, f, k)
            models, valid = four_point_focal_length_radial_distortion(
                jnp.asarray(world), jnp.asarray(px))
            models = np.asarray(models)
            ok = False
            for m, v in zip(models, np.asarray(valid)):
                if not v:
                    continue
                Re = np.asarray(rot.angle_axis_to_rotation_matrix(
                    jnp.asarray(m[3:6])))
                if (_rot_err_deg(R, Re) < 0.2
                        and np.linalg.norm(m[0:3] - c) < 0.05
                        and abs(m[6] - f) / f < 0.02
                        and abs(m[7] - k) < 0.3 * abs(k) + 1e-9):
                    ok = True
            found += ok
        assert found >= 4

    def test_zero_distortion(self):
        rng = np.random.default_rng(19)
        f = 600.0
        world, px, (c, aa, R) = _make_scene(rng, 4, f, -1e-12)
        models, valid = four_point_focal_length_radial_distortion(
            jnp.asarray(world), jnp.asarray(px))
        models = np.asarray(models)
        ok = any(
            v and abs(m[6] - f) / f < 0.02 and np.linalg.norm(
                m[0:3] - c) < 0.05
            for m, v in zip(models, np.asarray(valid)))
        assert ok


class TestP5Pfr:
    def test_noise_free_one_param(self):
        rng = np.random.default_rng(23)
        f = 1000.0
        k = -4e-7
        found = 0
        for trial in range(6):
            world, px, (c, aa, R) = _make_scene(rng, 5, f, k)
            models, valid = five_point_focal_length_radial_distortion(
                jnp.asarray(world), jnp.asarray(px), num_radial=1)
            models = np.asarray(models)
            ok = False
            for m, v in zip(models, np.asarray(valid)):
                if not v:
                    continue
                Re = np.asarray(rot.angle_axis_to_rotation_matrix(
                    jnp.asarray(m[3:6])))
                if (_rot_err_deg(R, Re) < 0.2
                        and np.linalg.norm(m[0:3] - c) < 0.05
                        and abs(m[6] - f) / f < 0.02):
                    ok = True
            found += ok
        assert found >= 4

    def test_three_params_does_not_blow_up(self):
        rng = np.random.default_rng(29)
        world, px, _ = _make_scene(rng, 5, 900.0, -3e-7)
        models, valid = five_point_focal_length_radial_distortion(
            jnp.asarray(world), jnp.asarray(px), num_radial=3)
        assert np.asarray(valid).any()
        assert models.shape == (4, 10)

"""Tests mirroring the reference's rotation/math unit tests
(ref: src/theia/math/rotation_test.cc pattern: random rotations,
round-trip and composition identities)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu.math import rotation as rot


def random_aa(rng, n):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, size=(n, 1))
    return jnp.asarray(axis * theta)


def test_aa_matrix_round_trip(rng):
    aa = random_aa(rng, 64)
    R = rot.angle_axis_to_rotation_matrix(aa)
    # Orthonormal, det +1
    eye = jnp.eye(3)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2),
                               jnp.broadcast_to(eye, R.shape), atol=1e-10)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-10)
    aa2 = rot.rotation_matrix_to_angle_axis(R)
    np.testing.assert_allclose(aa2, aa, atol=1e-8)


def test_small_angle_round_trip():
    aa = jnp.array([[1e-9, -2e-9, 1e-10], [0.0, 0.0, 0.0], [1e-4, 0, 0]])
    R = rot.angle_axis_to_rotation_matrix(aa)
    aa2 = rot.rotation_matrix_to_angle_axis(R)
    np.testing.assert_allclose(aa2, aa, atol=1e-9)


def test_near_pi_round_trip(rng):
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    aa = jnp.asarray(axis * (np.pi - 1e-5))
    R = rot.angle_axis_to_rotation_matrix(aa)
    aa2 = rot.rotation_matrix_to_angle_axis(R)
    err = rot.rotation_error_deg(aa, aa2)
    assert np.max(np.asarray(err)) < 1e-4


def test_rotate_point_matches_matrix(rng):
    aa = random_aa(rng, 32)
    pt = jnp.asarray(rng.normal(size=(32, 3)))
    R = rot.angle_axis_to_rotation_matrix(aa)
    expected = jnp.einsum("nij,nj->ni", R, pt)
    got = rot.angle_axis_rotate_point(aa, pt)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_compose(rng):
    aa1, aa2 = random_aa(rng, 8), random_aa(rng, 8)
    R = rot.angle_axis_to_rotation_matrix(rot.multiply_rotations(aa1, aa2))
    R_ref = (rot.angle_axis_to_rotation_matrix(aa1)
             @ rot.angle_axis_to_rotation_matrix(aa2))
    np.testing.assert_allclose(R, R_ref, atol=1e-9)


def test_grad_safe_at_zero():
    g = jax.grad(lambda aa: jnp.sum(
        rot.angle_axis_rotate_point(aa, jnp.array([1.0, 2.0, 3.0]))))(
        jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda aa: jnp.sum(
        rot.angle_axis_to_rotation_matrix(aa)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_project_to_rotation(rng):
    aa = random_aa(rng, 4)
    R = rot.angle_axis_to_rotation_matrix(aa)
    noisy = R + 0.01 * jnp.asarray(rng.normal(size=R.shape))
    Rp = rot.project_to_rotation_matrix(noisy)
    np.testing.assert_allclose(Rp @ jnp.swapaxes(Rp, -1, -2),
                               jnp.broadcast_to(jnp.eye(3), Rp.shape),
                               atol=1e-10)
    assert np.max(np.abs(np.asarray(Rp - R))) < 0.05


def test_relative_rotation(rng):
    aa1, aa2 = random_aa(rng, 8), random_aa(rng, 8)
    rel = rot.relative_rotation(aa1, aa2)
    R_rel = rot.angle_axis_to_rotation_matrix(rel)
    R1 = rot.angle_axis_to_rotation_matrix(aa1)
    R2 = rot.angle_axis_to_rotation_matrix(aa2)
    np.testing.assert_allclose(R_rel @ R1, R2, atol=1e-9)

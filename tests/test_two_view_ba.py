"""Two-view BA tests (ref: bundle_adjust_two_views_test.cc,
optimize_relative_position_with_known_rotation_test.cc)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.ba.two_view import (
    bundle_adjust_two_views_angular,
    optimize_relative_position_with_known_rotation)


def make_pair(rng, n=60, noise=0.0):
    aa = np.array([0.12, -0.23, 0.17])
    t = np.array([1.0, 0.3, -0.2]); t /= np.linalg.norm(t)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    p2 = pts @ R.T + t
    x1 = pts[:, :2] / pts[:, 2:] + rng.normal(scale=noise, size=(n, 2))
    x2 = p2[:, :2] / p2[:, 2:] + rng.normal(scale=noise, size=(n, 2))
    return aa, t, R, jnp.asarray(x1), jnp.asarray(x2)


def test_two_view_angular_refinement(rng):
    aa, t, R, x1, x2 = make_pair(rng, n=200, noise=2e-4)
    # perturb the pose; refinement must pull it back
    aa0 = aa + rng.normal(scale=0.01, size=3)
    t0 = t + rng.normal(scale=0.02, size=3)
    w = jnp.ones(x1.shape[0])
    aa_ref, t_ref = bundle_adjust_two_views_angular(
        jnp.asarray(aa0), jnp.asarray(t0), x1, x2, w, iters=20)
    err1 = float(rot.rotation_error_deg(aa_ref, jnp.asarray(aa)))
    assert err1 < 0.05, err1
    t_ang1 = np.degrees(np.arccos(np.clip(abs(float(
        jnp.dot(t_ref, jnp.asarray(t)))), -1, 1)))
    assert t_ang1 < 0.15, t_ang1


def test_optimize_relative_position_known_rotation(rng):
    aa, t, R, x1, x2 = make_pair(rng, noise=5e-4)
    # cameras: cam1 at origin identity; cam2 has orientation aa,
    # position_2 (cam-1 frame) = -R^T t ... the relative position of
    # camera 2 in camera 1's frame is c2 = -R^T t
    c2 = -R.T @ t
    c2 /= np.linalg.norm(c2)
    # rotations in this test: R1 = I, R2 = R (world->cam)
    init = c2 + rng.normal(scale=0.1, size=3)
    init /= np.linalg.norm(init)
    out = optimize_relative_position_with_known_rotation(
        jnp.asarray(init), jnp.eye(3), jnp.asarray(R), x1, x2,
        jnp.ones(x1.shape[0]))
    out = np.asarray(out)
    ang_init = np.degrees(np.arccos(np.clip(abs(init @ c2), -1, 1)))
    ang = np.degrees(np.arccos(np.clip(abs(out @ c2), -1, 1)))
    assert ang < 0.5, (ang_init, ang)

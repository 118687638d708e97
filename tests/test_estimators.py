"""RANSAC estimator tests mirroring ref: src/theia/sfm/estimators/*_test.cc
(synthetic correspondences + outliers + noise; inlier recall and model
accuracy gates)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm import estimators
from theiasfm_tpu.solvers import RansacOptions


def make_scene(rng, n_inl=100, n_out=30, noise=0.0,
               aa=(0.15, -0.25, 0.1), t=(1.0, 0.3, -0.2)):
    aa = np.asarray(aa)
    t = np.asarray(t, float)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n_inl, 3))
    p2 = pts @ R.T + t
    x1 = pts[:, :2] / pts[:, 2:]
    x2 = p2[:, :2] / p2[:, 2:] + rng.normal(scale=noise, size=(n_inl, 2))
    x1o = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    x2o = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    x1 = np.concatenate([x1, x1o])
    x2 = np.concatenate([x2, x2o])
    return (jnp.asarray(x1), jnp.asarray(x2), R, t / np.linalg.norm(t),
            n_inl)


def test_estimate_relative_pose(rng, key):
    x1, x2, R, t, n_inl = make_scene(rng, noise=1e-3)
    opts = RansacOptions(error_thresh=(2e-3) ** 2, num_hypotheses=64)
    out = estimators.estimate_relative_pose(key, x1, x2, opts)
    assert int(out["num_inliers"]) >= 0.9 * n_inl
    # rotation within 1 degree, translation within 2 degrees
    R_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(out["R"]).T @ R) - 1) / 2, -1, 1)))
    t_ang = np.degrees(np.arccos(np.clip(
        abs(float(jnp.dot(out["t"], jnp.asarray(t)))), -1, 1)))
    assert R_err < 1.0, R_err
    assert t_ang < 2.0, t_ang


def test_estimate_fundamental(rng, key):
    x1, x2, R, t, n_inl = make_scene(rng, noise=5e-4)
    opts = RansacOptions(error_thresh=(2e-3) ** 2, num_hypotheses=128)
    out = estimators.estimate_fundamental(key, x1, x2, opts)
    assert int(out["num_inliers"]) >= 0.9 * n_inl
    inl = np.asarray(out["inliers"])
    assert inl[:n_inl].mean() > 0.9
    assert inl[n_inl:].mean() < 0.2


def test_estimate_homography(rng, key):
    aa = np.array([0.05, -0.1, 0.08])
    t = np.array([0.4, -0.1, 0.2])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 5], [2, 2, 5.0001], size=(80, 3))
    p2 = pts @ R.T + t
    x1 = pts[:, :2] / pts[:, 2:]
    x2 = p2[:, :2] / p2[:, 2:]
    x1 = np.concatenate([x1, rng.uniform(-0.5, 0.5, (20, 2))])
    x2 = np.concatenate([x2, rng.uniform(-0.5, 0.5, (20, 2))])
    opts = RansacOptions(error_thresh=(1e-3) ** 2, num_hypotheses=128)
    out = estimators.estimate_homography(key, jnp.asarray(x1),
                                         jnp.asarray(x2), opts)
    assert int(out["num_inliers"]) >= 75


def test_estimate_absolute_pose(rng, key):
    aa = np.array([0.2, 0.4, -0.1])
    c = np.array([1.0, -2.0, 0.5])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    world = rng.uniform([-3, -3, 4], [3, 3, 12], size=(100, 3)) + c
    cam = (world - c) @ R.T
    keep = cam[:, 2] > 0.5
    world, cam = world[keep], cam[keep]
    n = len(world)
    image = cam[:, :2] / cam[:, 2:] + rng.normal(scale=5e-4, size=(n, 2))
    # outliers
    world = np.concatenate([world, rng.uniform(-5, 5, (30, 3)) + c])
    image = np.concatenate([image, rng.uniform(-0.5, 0.5, (30, 2))])
    opts = RansacOptions(error_thresh=(2e-3) ** 2, num_hypotheses=128)
    out = estimators.estimate_calibrated_absolute_pose(
        key, jnp.asarray(world), jnp.asarray(image), opts)
    extr = np.asarray(out["extrinsics"])
    assert int(out["num_inliers"]) >= 0.9 * n
    assert np.linalg.norm(extr[:3] - c) < 0.02, extr
    assert np.linalg.norm(extr[3:] - aa) < 0.01

"""Tests for uncalibrated/transform/triangulation estimators
(ref: estimate_uncalibrated_*_test.cc, estimate_triangulation_test.cc,
estimate_rigid_transformation_test.cc patterns)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm import estimators
from theiasfm_tpu.solvers import RansacOptions


def test_uncalibrated_absolute_pose(rng, key):
    aa = np.array([0.2, -0.3, 0.1])
    c = np.array([1.0, 2.0, -1.0])
    focal = 800.0
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    world = rng.uniform([-3, -3, 5], [3, 3, 12], size=(80, 3)) + c
    cam = (world - c) @ R.T
    keep = cam[:, 2] > 0.5
    world, cam = world[keep], cam[keep]
    image = cam[:, :2] / cam[:, 2:] * focal
    image += rng.normal(scale=0.3, size=image.shape)
    # outliers
    n = len(world)
    world = np.concatenate([world, rng.uniform(-5, 5, (15, 3)) + c])
    image = np.concatenate([image, rng.uniform(-400, 400, (15, 2))])
    opts = RansacOptions(error_thresh=3.0 ** 2, num_hypotheses=256)
    out = estimators.estimate_uncalibrated_absolute_pose(
        key, jnp.asarray(world), jnp.asarray(image), opts)
    assert int(out["num_inliers"]) >= 0.9 * n
    assert abs(float(out["focal_length"]) - focal) / focal < 0.05
    assert np.linalg.norm(np.asarray(out["extrinsics"])[:3] - c) < 0.1


def test_uncalibrated_relative_pose(rng, key):
    aa = np.array([0.1, -0.2, 0.15])
    t = np.array([1.0, 0.4, -0.2]); t /= np.linalg.norm(t)
    f1, f2 = 700.0, 900.0
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(150, 3))
    p2 = pts @ R.T + t
    x1 = pts[:, :2] / pts[:, 2:] * f1
    x2 = p2[:, :2] / p2[:, 2:] * f2
    x1 += rng.normal(scale=0.3, size=x1.shape)
    opts = RansacOptions(error_thresh=2.0 ** 2, num_hypotheses=256)
    out = estimators.estimate_uncalibrated_relative_pose(
        key, jnp.asarray(x1), jnp.asarray(x2), opts)
    assert int(out["num_inliers"]) > 130
    assert bool(out["focal_valid"])
    assert abs(float(out["focal_length_1"]) - f1) / f1 < 0.12
    assert abs(float(out["focal_length_2"]) - f2) / f2 < 0.12
    R_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(out["R"]).T @ R) - 1) / 2, -1, 1)))
    assert R_err < 3.0, R_err


def test_rigid_and_similarity_transform(rng, key):
    aa = rng.normal(size=3) * 0.5
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    t = rng.normal(size=3)
    s = 2.5
    src = rng.normal(size=(60, 3))
    dst = s * src @ R.T + t
    dst[50:] += rng.normal(scale=5.0, size=(10, 3))  # outliers
    opts = RansacOptions(error_thresh=0.01, num_hypotheses=128)
    out = estimators.estimate_rigid_transform(
        key, jnp.asarray(src), jnp.asarray(dst), opts, with_scale=True)
    assert int(out["num_inliers"]) >= 50
    assert abs(float(out["scale"]) - s) < 0.01
    np.testing.assert_allclose(np.asarray(out["R"]), R, atol=1e-6)

    # rigid (no scale)
    dst2 = src @ R.T + t
    out2 = estimators.estimate_rigid_transform(
        key, jnp.asarray(src), jnp.asarray(dst2), opts, with_scale=False)
    assert abs(float(out2["scale"]) - 1.0) < 1e-9
    np.testing.assert_allclose(np.asarray(out2["t"]), t, atol=1e-6)


def test_estimate_triangulation(rng, key):
    X_true = np.array([0.5, -0.3, 6.0])
    origins = rng.normal(size=(20, 3)) * 2.0
    dirs = X_true - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # corrupt 5 rays
    dirs[15:] = rng.normal(size=(5, 3))
    dirs[15:] /= np.linalg.norm(dirs[15:], axis=-1, keepdims=True)
    opts = RansacOptions(error_thresh=1e-6, num_hypotheses=64)
    out = estimators.estimate_triangulation(
        key, jnp.asarray(origins), jnp.asarray(dirs), opts)
    assert int(out["num_inliers"]) >= 15
    np.testing.assert_allclose(np.asarray(out["point"]), X_true,
                               atol=1e-6)


def test_dominant_plane(rng, key):
    from theiasfm_tpu.sfm.estimators.transforms import (
        estimate_dominant_plane_from_points)
    n_true = np.array([0.2, 0.5, 1.0]); n_true /= np.linalg.norm(n_true)
    d_true = -2.0
    # points on plane + noise + outliers
    basis = np.linalg.svd(n_true[None])[2][1:]
    uv = rng.uniform(-5, 5, (80, 2))
    pts = uv @ basis - d_true * n_true
    pts += 0.01 * rng.normal(size=pts.shape)
    pts = np.concatenate([pts, rng.uniform(-5, 5, (20, 3))])
    opts = RansacOptions(error_thresh=0.01, num_hypotheses=64)
    out = estimate_dominant_plane_from_points(
        key, jnp.asarray(pts), opts)
    assert int(out["num_inliers"]) >= 75
    plane = np.asarray(out["plane"])
    n_est = plane[:3] * np.sign(plane[:3] @ n_true)
    assert np.abs(n_est - n_true).max() < 0.01


def test_cycle_filter(rng):
    from theiasfm_tpu.sfm.global_pose.cycle_filter import (
        filter_view_graph_cycles_by_rotation)
    from theiasfm_tpu.sfm.view_graph import TwoViewInfo, ViewGraph
    from theiasfm_tpu.math import rotation as rot
    aa_gt = rng.normal(size=(6, 3)) * 0.4
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa_gt)))
    g = ViewGraph()
    for i in range(6):
        for j in range(i + 1, 6):
            aa_ij = np.asarray(rot.rotation_matrix_to_angle_axis(
                jnp.asarray(R[j] @ R[i].T)))
            g.add_edge(i, j, TwoViewInfo(rotation_2=aa_ij,
                                         num_verified_matches=50))
    # corrupt one edge badly
    g.edge(0, 3).rotation_2 = rng.normal(size=3) + 2.0
    removed = filter_view_graph_cycles_by_rotation(g, 3.0)
    assert removed >= 1
    assert not g.has_edge(0, 3)
    assert g.has_edge(0, 1) and g.has_edge(4, 5)

"""Minimal solver tests mirroring ref: src/theia/sfm/pose/*_test.cc
(random geometry, exact recovery on noise-free data, behavior under
noise; ref test_util.h patterns)."""
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm import pose


def make_two_view(rng, n, aa=(0.1, -0.2, 0.15), t=(1.0, 0.2, -0.1)):
    """Normalized-coordinate correspondences for a random scene.
    Returns x1, x2, R, t_unit with p2 = R p1 + t."""
    aa = np.asarray(aa)
    t = np.asarray(t, dtype=float)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts1 = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    pts2 = pts1 @ R.T + t
    x1 = pts1[:, :2] / pts1[:, 2:]
    x2 = pts2[:, :2] / pts2[:, 2:]
    return jnp.asarray(x1), jnp.asarray(x2), R, t / np.linalg.norm(t)


def essential_from(R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return E / np.linalg.norm(E)


def norm_unit(M):
    M = np.asarray(M)
    M = M / np.linalg.norm(M)
    return M * np.sign(M.flat[np.argmax(np.abs(M.flat))])


def test_eight_point_exact(rng):
    x1, x2, R, t = make_two_view(rng, 8)
    F, ok = pose.eight_point_fundamental(x1, x2)
    assert bool(ok[0])
    E_true = essential_from(R, t)  # normalized coords -> F == E
    np.testing.assert_allclose(norm_unit(F[0]), norm_unit(E_true), atol=1e-6)


def test_npoint_fundamental_weighted(rng):
    x1, x2, R, t = make_two_view(rng, 60)
    # corrupt 20 points but zero their weights
    x2_bad = x2.at[40:].add(0.3)
    w = jnp.concatenate([jnp.ones(40), jnp.zeros(20)])
    F, ok = pose.npoint_fundamental(x1, x2_bad, weights=w)
    E_true = essential_from(R, t)
    np.testing.assert_allclose(norm_unit(F), norm_unit(E_true), atol=1e-6)


def test_seven_point(rng):
    x1, x2, R, t = make_two_view(rng, 7)
    Fs, valid = pose.seven_point_fundamental(x1, x2)
    E_true = norm_unit(essential_from(R, t))
    errs = [np.abs(norm_unit(Fs[i]) - E_true).max()
            for i in range(3) if bool(valid[i])]
    assert len(errs) >= 1 and min(errs) < 1e-6


def test_homography(rng):
    # plane z = 5 induces homography x2 ~ (R + t n^T / d) x1
    aa = np.array([0.05, -0.1, 0.08])
    t = np.array([0.4, -0.1, 0.2])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts1 = rng.uniform([-2, -2, 5], [2, 2, 5.0000001], size=(12, 3))
    pts2 = pts1 @ R.T + t
    x1 = jnp.asarray(pts1[:, :2] / pts1[:, 2:])
    x2 = jnp.asarray(pts2[:, :2] / pts2[:, 2:])
    H, ok = pose.four_point_homography(x1[:4], x2[:4])
    assert bool(ok[0])
    from theiasfm_tpu.sfm.pose.homography import homography_transfer_error_sq
    err = homography_transfer_error_sq(H[0], x1, x2)
    assert float(jnp.max(err)) < 1e-10
    Hn, okn = pose.npoint_homography(x1, x2)
    err = homography_transfer_error_sq(Hn, x1, x2)
    assert float(jnp.max(err)) < 1e-10


def test_p3p(rng):
    aa = np.array([0.2, 0.4, -0.1])
    c = np.array([1.0, -2.0, 0.5])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    world = rng.uniform([-2, -2, 4], [2, 2, 8], size=(3, 3))
    cam = (world - c) @ R.T
    image = jnp.asarray(cam[:, :2] / cam[:, 2:])
    extr, valid = pose.p3p_grunert(jnp.asarray(world), image)
    extr = np.asarray(extr)
    found = False
    for i in range(4):
        if not bool(valid[i]):
            continue
        if (np.linalg.norm(extr[i, :3] - c) < 1e-6 and
                np.linalg.norm(extr[i, 3:] - aa) < 1e-6):
            found = True
    assert found


def test_p3p_many_random(rng):
    """Recovery rate over many random problems (ref p3p test runs 100s)."""
    ok = 0
    trials = 50
    for _ in range(trials):
        aa = rng.normal(size=3) * 0.5
        c = rng.normal(size=3)
        R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
        world = rng.uniform([-2, -2, 4], [2, 2, 8], size=(3, 3)) + c
        cam = (world - c) @ R.T
        if np.any(cam[:, 2] < 0.1):
            trials -= 1
            continue
        image = jnp.asarray(cam[:, :2] / cam[:, 2:])
        extr, valid = pose.p3p_grunert(jnp.asarray(world), image)
        extr = np.asarray(extr)
        for i in range(4):
            if bool(valid[i]) and np.linalg.norm(extr[i, :3] - c) < 1e-5:
                ok += 1
                break
    assert ok >= 0.95 * trials, (ok, trials)


def test_five_point(rng):
    x1, x2, R, t = make_two_view(rng, 5)
    Es, valid = pose.five_point_essential(x1, x2)
    E_true = norm_unit(essential_from(R, t))
    best = np.inf
    for i in range(10):
        if bool(valid[i]):
            best = min(best, np.abs(norm_unit(Es[i]) - E_true).max())
    assert best < 1e-5, best


def test_five_point_many(rng):
    ok = 0
    trials = 30
    for _ in range(trials):
        aa = rng.normal(size=3) * 0.4
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        x1, x2, R, tu = make_two_view(rng, 5, aa=aa, t=t)
        Es, valid = pose.five_point_essential(x1, x2)
        E_true = norm_unit(essential_from(R, tu))
        for i in range(10):
            if bool(valid[i]) and \
                    np.abs(norm_unit(Es[i]) - E_true).max() < 1e-4:
                ok += 1
                break
    assert ok >= 0.9 * trials, (ok, trials)


def test_decompose_essential(rng):
    x1, x2, R, t = make_two_view(rng, 20)
    E = jnp.asarray(essential_from(R, t))
    R_got, t_got, n_front = pose.relative_pose_from_essential(E, x1, x2)
    assert int(n_front) == 20
    np.testing.assert_allclose(np.asarray(R_got), R, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_got), t, atol=1e-8)


def test_sampson_distance(rng):
    x1, x2, R, t = make_two_view(rng, 30)
    E = jnp.asarray(essential_from(R, t))
    d = pose.sampson_distance_sq(E, x1, x2)
    assert float(jnp.max(d)) < 1e-12
    d2 = pose.sampson_distance_sq(E, x1, x2 + 0.01)
    assert float(jnp.median(d2)) > 1e-8


def test_relative_pose_known_rotation(rng):
    from theiasfm_tpu.sfm.pose.known_rotation import (
        relative_pose_from_two_points_with_known_rotation)
    aa = np.array([0.1, -0.2, 0.15])
    t = np.array([0.5, 0.3, -0.2]); t /= np.linalg.norm(t)
    x1, x2, R, tu = make_two_view(rng, 2, aa=aa, t=t)
    t_got, valid = relative_pose_from_two_points_with_known_rotation(
        x1, x2, jnp.asarray(R))
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(t_got), tu, atol=1e-8)


def test_p4pf(rng):
    """ref four_point_focal_length_test.cc: recover pose + focal from 4
    points (principal-point-centered pixels)."""
    from theiasfm_tpu.sfm.pose.p4pf import p4pf
    ok = 0
    trials = 20
    for _ in range(trials):
        aa = rng.normal(size=3) * 0.4
        c = rng.normal(size=3)
        focal = rng.uniform(400, 1500)
        R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
        world = rng.uniform([-2, -2, 4], [2, 2, 9], size=(4, 3)) + c
        cam = (world - c) @ R.T
        if np.any(cam[:, 2] < 0.5):
            trials -= 1
            continue
        image = cam[:, :2] / cam[:, 2:] * focal
        models, valid = p4pf(jnp.asarray(world), jnp.asarray(image))
        models = np.asarray(models)
        for i in range(4):
            if not bool(valid[i]):
                continue
            if (np.linalg.norm(models[i, :3] - c) < 0.05 and
                    abs(models[i, 6] - focal) / focal < 0.02):
                ok += 1
                break
    assert ok >= 0.85 * trials, (ok, trials)


def test_epnp(rng):
    """EPnP (nonminimal PnP, the DLS-PnP/UPnP role) + GN polish."""
    from theiasfm_tpu.sfm.pose.epnp import epnp
    from theiasfm_tpu.sfm.estimators import refine_absolute_pose_gn
    ok_count = 0
    trials = 20
    for _ in range(trials):
        aa = rng.normal(size=3) * 0.4
        c = rng.normal(size=3)
        R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
        world = rng.uniform([-2, -2, 4], [2, 2, 9], size=(30, 3)) + c
        cam = (world - c) @ R.T
        if np.any(cam[:, 2] < 0.5):
            trials -= 1
            continue
        image = cam[:, :2] / cam[:, 2:]
        extr, ok = epnp(jnp.asarray(world), jnp.asarray(image))
        if not bool(ok):
            continue
        extr = refine_absolute_pose_gn(extr, jnp.asarray(world),
                                       jnp.asarray(image),
                                       jnp.ones(len(world)))
        extr = np.asarray(extr)
        if (np.linalg.norm(extr[:3] - c) < 1e-4 and
                np.linalg.norm(extr[3:] - aa) < 1e-4):
            ok_count += 1
    assert ok_count >= 0.9 * trials, (ok_count, trials)

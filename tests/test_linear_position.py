"""Triplet-based linear position estimation + alignment + GPS tests.

ref test models: linear_position_estimator_test.cc,
compute_triplet_baseline_ratios_test.cc, align_rotations_test.cc,
gps_converter_test.cc.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.reconstruction import Reconstruction, CameraModelType
from theiasfm_tpu.sfm.global_pose.linear_position import (
    LinearPositionOptions, compute_triplet_baseline_ratios,
    estimate_positions_linear_triplet)
from theiasfm_tpu.sfm.transformation import align_rotations
from theiasfm_tpu.sfm.gps_converter import ecef_to_lla, lla_to_ecef


def _make_scene(V=8, N=200, seed=42, noise_px=0.0):
    rng = np.random.default_rng(seed)
    positions = rng.uniform(-2, 2, (V, 3))
    positions[:, 2] *= 0.3
    orient = rng.uniform(-0.2, 0.2, (V, 3))
    pts = rng.uniform(-3, 3, (N, 3))
    pts[:, 2] += 12.0

    recon = Reconstruction()
    vids = []
    for i in range(V):
        vid = recon.add_view(f"v{i}")
        vids.append(vid)
        view = recon.views[vid]
        view.camera.model_type = CameraModelType.PINHOLE
        view.camera.intrinsics[0] = 500.0
        view.camera.intrinsics[3:5] = [320.0, 240.0]
        view.camera.extrinsics = np.concatenate([positions[i], orient[i]])
    tids = [recon.add_track() for _ in pts]
    Rs = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(orient)))
    for i, vid in enumerate(vids):
        view = recon.views[vid]
        Xc = (Rs[i] @ (pts - positions[i]).T).T
        px = 500.0 * Xc[:, :2] / Xc[:, 2:3] + np.array([320.0, 240.0])
        px += rng.normal(0, noise_px, px.shape)
        for tid, p in zip(tids, px):
            view.features[tid] = p
    edges, rel_pos = [], []
    for i in range(V):
        for j in range(i + 1, V):
            edges.append((i, j))
            d = Rs[i] @ (positions[j] - positions[i])
            rel_pos.append(d / np.linalg.norm(d))
    return (recon, vids, orient, np.asarray(edges), np.asarray(rel_pos),
            positions)


def _position_error(est, gt):
    gt = gt - gt[0]
    est = est - est[0]
    scale = np.sum(gt * est) / max(np.sum(est * est), 1e-12)
    return np.linalg.norm(gt - scale * est, axis=1)


def test_baseline_ratios_exact():
    # one triplet with known geometry: baselines scale with true distances
    rng = np.random.default_rng(3)
    c = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.5, 2.0, 0]])
    aa = rng.uniform(-0.1, 0.1, (3, 3))
    Rs = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform(-2, 2, (40, 3))
    pts[:, 2] += 8.0
    f = [(Rs[i] @ (pts - c[i]).T).T for i in range(3)]
    f = [x / np.linalg.norm(x, axis=1, keepdims=True) for x in f]

    def rel(i, j):
        R = Rs[j] @ Rs[i].T
        p = Rs[i] @ (c[j] - c[i])
        return R, p / np.linalg.norm(p)

    R01, p01 = rel(0, 1)
    R02, p02 = rel(0, 2)
    R12, p12 = rel(1, 2)
    baselines, valid = compute_triplet_baseline_ratios(
        jnp.asarray(R01)[None], jnp.asarray(R02)[None],
        jnp.asarray(R12)[None], jnp.asarray(p01)[None],
        jnp.asarray(p02)[None], jnp.asarray(p12)[None],
        jnp.asarray(f[0])[None], jnp.asarray(f[1])[None],
        jnp.asarray(f[2])[None], jnp.ones((1, 40), bool))
    assert bool(valid[0])
    b01 = np.linalg.norm(c[1] - c[0])
    b02 = np.linalg.norm(c[2] - c[0])
    b12 = np.linalg.norm(c[2] - c[1])
    expect = np.array([1.0, b02 / b01, b12 / b01])
    np.testing.assert_allclose(np.asarray(baselines[0]), expect, rtol=1e-6)


def test_linear_triplet_positions_exact():
    recon, vids, orient, edges, rel_pos, gt = _make_scene()
    pos, covered = estimate_positions_linear_triplet(
        recon, vids, orient, edges, rel_pos)
    assert covered.all()
    err = _position_error(pos, gt)
    assert err.max() < 1e-6 * np.linalg.norm(gt - gt[0], axis=1).max()


def test_linear_triplet_positions_noisy():
    recon, vids, orient, edges, rel_pos, gt = _make_scene(noise_px=1.0)
    pos, covered = estimate_positions_linear_triplet(
        recon, vids, orient, edges, rel_pos)
    assert covered.all()
    err = _position_error(pos, gt)
    spread = np.linalg.norm(gt - gt[0], axis=1).max()
    assert err.max() < 0.05 * spread


def test_linear_triplet_inverse_power_path():
    recon, vids, orient, edges, rel_pos, gt = _make_scene()
    opts = LinearPositionOptions(dense_threshold=1)  # force iterative path
    pos, covered = estimate_positions_linear_triplet(
        recon, vids, orient, edges, rel_pos, opts=opts)
    assert covered.all()
    err = _position_error(pos, gt)
    assert err.max() < 1e-4 * np.linalg.norm(gt - gt[0], axis=1).max()


def test_align_rotations():
    rng = np.random.default_rng(7)
    gt = rng.uniform(-1, 1, (20, 3))
    R_align = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray([0.3, -0.2, 0.5])))
    R_gt = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(gt)))
    # unaligned_i = gt_i * R_align^{-1}  =>  unaligned_i @ R_align = gt_i
    unaligned = np.asarray(rot.rotation_matrix_to_angle_axis(
        jnp.asarray(R_gt @ R_align.T)))
    aligned = align_rotations(gt, unaligned)
    err = np.asarray([rot.rotation_error_deg(jnp.asarray(a), jnp.asarray(g))
                      for a, g in zip(aligned, gt)])
    assert err.max() < 1e-4


def test_gps_roundtrip():
    lla = np.array([
        [37.8199, -122.4783, 120.0],   # mid-latitude
        [0.0, 0.0, 0.0],               # equator/prime meridian
        [-33.8568, 151.2153, 40.0],    # southern hemisphere
        [89.9, 45.0, 1000.0],          # near pole (acos branch)
        [51.5007, -0.1246, 35.0],
    ])
    ecef = lla_to_ecef(lla)
    back = ecef_to_lla(ecef)
    np.testing.assert_allclose(back[:, :2], lla[:, :2], atol=1e-9)
    np.testing.assert_allclose(back[:, 2], lla[:, 2], atol=1e-6)
    # spot-check a known ECEF: equator/prime meridian at the surface
    np.testing.assert_allclose(ecef[1], [6378137.0, 0.0, 0.0], atol=1e-6)

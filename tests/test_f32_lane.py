"""f32 numerics lane: the production dtype, in CI.

The CPU suite runs f64 globally (conftest); production on TPU runs
f32/bf16. This lane re-runs the numerically hard subsystems — BA
convergence, rotation averaging, LUD positions, batched two-view
verification — with x64 DISABLED so every array and every trace is
f32, proving the production precision suffices off-chip too (round-4
verdict weak #5). Run just this lane with:  pytest -m f32

ref discipline: the reference runs everything in double (Ceres/Eigen
defaults); the TPU build's value proposition is that f32 + bf16
matvecs reach the same optima.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.f32

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))


@pytest.fixture(autouse=True)
def f32_mode():
    """Disable x64 for the duration of each test in this module."""
    jax.config.update("jax_enable_x64", False)
    # drop f64-traced executables so nothing silently reuses them
    jax.clear_caches()
    yield
    jax.clear_caches()
    jax.config.update("jax_enable_x64", True)


def _reproj_rms(prob):
    from theiasfm_tpu.camera import models as cm
    pix, depth = cm.project(
        cm.CameraModelType.PINHOLE,
        prob.extrinsics[prob.obs_cam], prob.intrinsics[0],
        prob.points[prob.obs_pt])
    err = jnp.linalg.norm(pix - prob.obs_pix, axis=1)
    m = prob.obs_mask
    return float(jnp.sqrt(jnp.sum(jnp.where(m, err, 0.0) ** 2)
                          / jnp.sum(m)))


def test_ba_converges_f32():
    """Production BA config (PCG + bf16 matvec + eta forcing + inner
    iterations) at pure f32: converges to the 0.5 px noise floor."""
    from __graft_entry__ import _make_problem
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust
    from theiasfm_tpu.sfm.ba.bundle_adjustment import add_point_obs_map

    prob = _make_problem(n_cams=24, n_pts=800, obs_per_pt=4,
                         dtype=jnp.float32)
    prob = add_point_obs_map(prob)
    assert prob.points.dtype == jnp.float32
    opts = BAOptions(max_iterations=25, loss="huber", loss_scale=2.0,
                     linear_solver="pcg", matvec_bf16=True,
                     cg_eta=0.1, point_indices_sorted=True)
    out, summary = jax.jit(lambda p: bundle_adjust(p, opts))(prob)
    assert out.points.dtype == jnp.float32
    rms = _reproj_rms(out)
    # 0.5 px observation noise -> converged RMS ~= noise level
    assert rms < 0.9, rms
    assert float(summary.final_cost) < float(summary.initial_cost)


def test_rotation_averaging_f32():
    from bench_global_stages import build_view_graph
    from theiasfm_tpu.math import rotation as rot
    from theiasfm_tpu.sfm.global_pose import (
        orientations_from_mst, robust_rotation_averaging)

    edges, rel_rot, rel_dir, weights, extrs = build_view_graph(
        120, seed=3)
    gt = extrs[:, 3:]
    init = orientations_from_mst(120, edges, rel_rot, weights)
    est = robust_rotation_averaging(
        np.asarray(init, np.float32), edges,
        np.asarray(rel_rot, np.float32))
    est = np.asarray(est)
    assert est.dtype == np.float32
    # global gauge: compare relative rotations to ground truth
    R_est = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(est)))
    R_gt = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(np.asarray(gt, np.float32))))
    errs = []
    for (i, j) in edges[::7]:
        dR = (R_est[j] @ R_est[i].T) @ (R_gt[j] @ R_gt[i].T).T
        c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(c)))
    med = float(np.median(errs))
    # 0.3 deg edge noise, 5% outliers -> sub-noise median error
    assert med < 0.5, med


def test_lud_positions_f32():
    from bench_global_stages import build_view_graph
    from theiasfm_tpu.sfm.global_pose import estimate_positions_lud

    edges, rel_rot, rel_dir, weights, extrs = build_view_graph(
        100, seed=5)
    gt = extrs[:, :3]
    est = estimate_positions_lud(
        np.asarray(extrs[:, 3:], np.float32), edges,
        np.asarray(rel_dir, np.float32),
        np.asarray(weights, np.float32))
    est = np.asarray(est)
    # similarity-align to ground truth (scale + translation; the
    # rotation gauge is fixed by using gt orientations)
    gt = np.asarray(gt, np.float32)
    c_e, c_g = est.mean(0), gt.mean(0)
    e0, g0 = est - c_e, gt - c_g
    s = float(np.sum(e0 * g0) / max(np.sum(e0 * e0), 1e-12))
    err = np.linalg.norm(s * e0 - g0, axis=1)
    diam = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    med = float(np.median(err)) / diam
    assert med < 0.01, med


def test_two_view_verification_f32(rng, key):
    from theiasfm_tpu.math import rotation as rot
    from theiasfm_tpu.sfm.pipeline.geometric_verification import (
        verify_matches_batch)

    focal = 600.0
    pp = (320.0, 240.0)
    aa = np.array([0.1, -0.15, 0.08], np.float32)
    t = np.array([1.0, 0.2, -0.1], np.float32)
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10],
                      size=(150, 3)).astype(np.float32)
    p2 = pts @ R.T + t
    pix1 = pts[:, :2] / pts[:, 2:] * focal + pp
    pix2 = p2[:, :2] / p2[:, 2:] * focal + pp
    pix1 = (pix1 + rng.normal(scale=0.4, size=pix1.shape)).astype(
        np.float32)
    pix1 = np.concatenate(
        [pix1, rng.uniform(0, 640, (40, 2)).astype(np.float32)])
    pix2 = np.concatenate(
        [pix2.astype(np.float32),
         rng.uniform(0, 640, (40, 2)).astype(np.float32)])

    n = len(pix1)
    infos, corrs = verify_matches_batch(
        key, pix1[None], pix2[None], np.ones((1, n), bool),
        np.full(1, focal, np.float32), np.full(1, focal, np.float32),
        np.asarray(pp, np.float32)[None],
        np.asarray(pp, np.float32)[None],
        np.zeros((1, 2, 2), np.float32))
    assert infos[0] is not None
    assert infos[0].num_verified_matches >= 110
    err = float(rot.rotation_error_deg(
        jnp.asarray(infos[0].rotation_2), jnp.asarray(aa)))
    assert err < 1.0, err

"""Bundle adjustment tests mirroring ref:
src/theia/sfm/bundle_adjustment/bundle_adjustment_test.cc (synthetic
reconstruction, perturb, re-optimize, check reprojection error), plus
shared-intrinsics-group and robust-loss cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu.camera.models import CameraModelType
from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.ba import BAOptions, BAProblem, ba_cost, bundle_adjust


def make_ba_problem(rng, n_cams=8, n_pts=120, noise_pix=0.0,
                    n_groups=1, model=CameraModelType.PINHOLE):
    # cameras on an arc looking at origin
    extr = []
    for v in range(n_cams):
        ang = 0.6 * (v / max(n_cams - 1, 1) - 0.5)
        c = np.array([10 * np.sin(ang), 0.3 * rng.normal(),
                      -10 * np.cos(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        aa = np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))
        extr.append(np.concatenate([c, aa]))
    extr = np.stack(extr)
    pts = rng.uniform(-2, 2, size=(n_pts, 3))
    intr = np.zeros((n_groups, 10))
    intr[:, 0] = 700.0  # focal
    intr[:, 1] = 1.0    # aspect
    intr[:, 3] = 320.0
    intr[:, 4] = 240.0

    cam_group = np.arange(n_cams) % n_groups
    obs_cam, obs_pt, obs_pix = [], [], []
    from theiasfm_tpu.camera import models as cm
    for ci in range(n_cams):
        pix, depth = cm.project(model, jnp.asarray(extr[ci]),
                                jnp.asarray(intr[cam_group[ci]]),
                                jnp.asarray(pts))
        pix = np.asarray(pix) + rng.normal(scale=noise_pix,
                                           size=(n_pts, 2))
        for pi in range(n_pts):
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_pix.append(pix[pi])
    M = len(obs_cam)
    prob = BAProblem(
        extrinsics=jnp.asarray(extr),
        intrinsics=jnp.asarray(intr),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam, dtype=jnp.int32),
        obs_group=jnp.asarray(cam_group, dtype=jnp.int32)[
            jnp.asarray(obs_cam, dtype=jnp.int32)],
        obs_pt=jnp.asarray(obs_pt, dtype=jnp.int32),
        obs_pix=jnp.asarray(np.stack(obs_pix)),
        obs_mask=jnp.ones(M, bool),
    )
    return prob


def perturb(prob, rng, cam_sigma=0.05, pt_sigma=0.05, aa_sigma=0.01):
    extr = np.asarray(prob.extrinsics).copy()
    extr[:, :3] += rng.normal(scale=cam_sigma, size=extr[:, :3].shape)
    extr[:, 3:] += rng.normal(scale=aa_sigma, size=extr[:, 3:].shape)
    pts = np.asarray(prob.points) + rng.normal(
        scale=pt_sigma, size=prob.points.shape)
    return prob._replace(extrinsics=jnp.asarray(extr),
                         points=jnp.asarray(pts))


def test_ba_converges_to_ground_truth(rng):
    gt = make_ba_problem(rng)
    noisy = perturb(gt, rng)
    opts = BAOptions(max_iterations=30, cg_iterations=60)
    cost_before = float(ba_cost(noisy, opts))
    out, summary = bundle_adjust(noisy, opts)
    cost_after = float(summary.final_cost)
    assert cost_after < 1e-10 * cost_before, (cost_before, cost_after)
    # mean reprojection error ~ 0
    assert cost_after / gt.obs_mask.shape[0] < 1e-8


def test_ba_with_noise_stays_near_gt(rng):
    gt = make_ba_problem(rng, noise_pix=0.5)
    noisy = perturb(gt, rng, cam_sigma=0.1, pt_sigma=0.1)
    opts = BAOptions(max_iterations=30, cg_iterations=60)
    out, summary = bundle_adjust(noisy, opts)
    M = int(gt.obs_mask.sum())
    rms = np.sqrt(2 * float(summary.final_cost) / M)
    assert rms < 0.8, rms  # ~pixel noise level


def test_ba_robust_loss_ignores_outliers(rng):
    gt = make_ba_problem(rng)
    # corrupt 5% of observations badly
    pix = np.asarray(gt.obs_pix).copy()
    M = pix.shape[0]
    idx = rng.choice(M, M // 20, replace=False)
    pix[idx] += rng.normal(scale=80.0, size=(len(idx), 2))
    noisy = perturb(gt._replace(obs_pix=jnp.asarray(pix)), rng)
    opts = BAOptions(max_iterations=40, cg_iterations=60,
                     loss="huber", loss_scale=2.0)
    out, summary = bundle_adjust(noisy, opts)
    # clean observations reproject ~perfectly (note: global gauge is
    # free, so we gate on reprojection rather than absolute positions)
    clean = np.ones(M, bool)
    clean[idx] = False
    clean_prob = out._replace(obs_mask=jnp.asarray(clean))
    clean_opts = BAOptions(max_iterations=0)
    clean_cost = float(ba_cost(clean_prob, clean_opts))
    rms = np.sqrt(2 * clean_cost / clean.sum())
    assert rms < 0.5, rms
    # non-robust BA must be clearly worse on the clean observations
    out_triv, _ = bundle_adjust(noisy, BAOptions(max_iterations=40,
                                                 cg_iterations=60))
    triv_cost = float(ba_cost(out_triv._replace(
        obs_mask=jnp.asarray(clean)), clean_opts))
    rms_triv = np.sqrt(2 * triv_cost / clean.sum())
    assert rms < 0.5 * rms_triv, (rms, rms_triv)


def test_ba_shared_intrinsics_focal(rng):
    gt = make_ba_problem(rng, n_groups=2)
    # perturb focal lengths; BA must recover them via shared groups
    intr = np.asarray(gt.intrinsics).copy()
    intr[:, 0] *= [1.05, 0.93]
    noisy = gt._replace(intrinsics=jnp.asarray(intr))
    noisy = perturb(noisy, rng, cam_sigma=0.02, pt_sigma=0.02)
    opts = BAOptions(max_iterations=40, cg_iterations=80,
                     optimize_intrinsics=(True,) + (False,) * 9)
    out, summary = bundle_adjust(noisy, opts)
    focals = np.asarray(out.intrinsics[:, 0])
    np.testing.assert_allclose(focals, [700.0, 700.0], rtol=2e-3)


def test_ba_multi_intrinsics_slots(rng):
    """Several active intrinsics slots (focal + pp + radial k1): the
    active-slot compression must recover all of them, on both solver
    paths (ref OptimizeIntrinsicsType bitmask combinations,
    bundle_adjustment.h:66-123)."""
    from theiasfm_tpu.sfm.ba.bundle_adjustment import add_point_obs_map
    gt = make_ba_problem(rng, n_cams=8, n_pts=150)
    intr = np.asarray(gt.intrinsics).copy()
    intr[:, 0] *= 1.04          # focal off by 4%
    intr[:, 3] += 4.0           # principal point off
    intr[:, 4] -= 3.0
    intr[:, 5] = 0.02           # spurious radial k1
    noisy = gt._replace(intrinsics=jnp.asarray(intr))
    noisy = perturb(noisy, rng, cam_sigma=0.02, pt_sigma=0.02)
    sel = tuple(i in (0, 3, 4, 5) for i in range(10))
    for extra in (dict(cg_iterations=150, cg_tol=1e-12),
                  dict(linear_solver="dense_schur")):
        opts = BAOptions(max_iterations=40, optimize_intrinsics=sel,
                         **extra)
        out, summary = bundle_adjust(add_point_obs_map(noisy), opts)
        got = np.asarray(out.intrinsics[0])
        np.testing.assert_allclose(got[0], 700.0, rtol=5e-3)
        np.testing.assert_allclose(got[3], 320.0, atol=2.0)
        np.testing.assert_allclose(got[4], 240.0, atol=2.0)
        np.testing.assert_allclose(got[5], 0.0, atol=5e-3)
        # inactive slots untouched
        np.testing.assert_array_equal(got[[1, 2, 6, 7, 8, 9]],
                                      np.asarray(intr[0])[[1, 2, 6, 7,
                                                           8, 9]])


def test_ba_frozen_intrinsics(rng):
    """optimize_intrinsics all-False: intrinsics must come back
    bit-identical while cameras/points still converge."""
    gt = make_ba_problem(rng)
    noisy = perturb(gt, rng)
    opts = BAOptions(max_iterations=25, cg_iterations=60,
                     optimize_intrinsics=(False,) * 10)
    out, summary = bundle_adjust(noisy, opts)
    np.testing.assert_array_equal(np.asarray(out.intrinsics),
                                  np.asarray(noisy.intrinsics))
    assert float(summary.final_cost) < 1e-8 * float(
        summary.initial_cost)


def test_ba_holds_constant_cameras(rng):
    gt = make_ba_problem(rng, n_cams=6)
    noisy = perturb(gt, rng)
    cam_mask = jnp.asarray([False, False] + [True] * 4)
    noisy = noisy._replace(cam_mask=cam_mask)
    opts = BAOptions(max_iterations=25, cg_iterations=60)
    out, _ = bundle_adjust(noisy, opts)
    # held cameras unchanged
    np.testing.assert_array_equal(np.asarray(out.extrinsics[:2]),
                                  np.asarray(noisy.extrinsics[:2]))


def test_ba_jit(rng):
    gt = make_ba_problem(rng, n_cams=4, n_pts=40)
    noisy = perturb(gt, rng)
    opts = BAOptions(max_iterations=10, cg_iterations=30)
    run = jax.jit(lambda p: bundle_adjust(p, opts))
    out, summary = run(noisy)
    assert float(summary.final_cost) < float(summary.initial_cost)


def test_bucketed_matches_direct(rng):
    """The (experimental) gather-reduce path and the bucketed path must
    match plain segment_sum BA."""
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        bundle_adjust_bucketed, pad_ba_problem)
    gt = make_ba_problem(rng, n_cams=5, n_pts=60)
    noisy = perturb(gt, rng)
    opts = BAOptions(max_iterations=8, cg_iterations=30,
                     function_tolerance=0.0)
    out_direct, s_direct = bundle_adjust(noisy, opts)
    # explicit gather-reduce maps path
    padded = pad_ba_problem(noisy, build_reduction_maps=True)
    out_maps, s_maps = bundle_adjust(padded, opts)
    np.testing.assert_allclose(float(s_maps.final_cost),
                               float(s_direct.final_cost),
                               rtol=0.1, atol=1e-15)
    out_bucket, s_bucket = bundle_adjust_bucketed(noisy, opts)
    # padding changes summation order/CG trajectory; both must converge
    np.testing.assert_allclose(float(s_bucket.final_cost),
                               float(s_direct.final_cost),
                               rtol=0.1, atol=1e-15)
    # the global similarity gauge is free, so solutions may drift apart
    # slightly even though both fit exactly
    np.testing.assert_allclose(np.asarray(out_bucket.points),
                               np.asarray(out_direct.points), atol=1e-3)


def test_dense_schur_matches_pcg(rng):
    """linear_solver='dense_schur' (explicit reduced camera system +
    Cholesky, ref Ceres DENSE_SCHUR) must match the matrix-free PCG
    solver and converge at least as well (it is exact)."""
    from theiasfm_tpu.sfm.ba.bundle_adjustment import add_point_obs_map
    gt = make_ba_problem(rng, n_cams=7, n_pts=90, n_groups=2)
    noisy = perturb(gt, rng)
    noisy = add_point_obs_map(noisy)
    base = dict(max_iterations=12, function_tolerance=0.0,
                optimize_intrinsics=(True,) + (False,) * 9)
    out_pcg, s_pcg = bundle_adjust(
        noisy, BAOptions(cg_iterations=200, cg_tol=1e-12, **base))
    out_den, s_den = bundle_adjust(
        noisy, BAOptions(linear_solver="dense_schur", **base))
    assert float(s_den.final_cost) <= 1.05 * float(s_pcg.final_cost) + 1e-12
    np.testing.assert_allclose(np.asarray(out_den.extrinsics),
                               np.asarray(out_pcg.extrinsics), atol=1e-4)


def test_dense_schur_pair_tables_match(rng):
    """The scatter-free camera-pair-table assembly must reproduce the
    chunked-scatter dense-Schur assembly (same math, different op
    ordering)."""
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_cam_pair_tables, add_point_obs_map)
    gt = make_ba_problem(rng, n_cams=6, n_pts=80, noise_pix=0.5)
    noisy = perturb(gt, rng)
    noisy = add_point_obs_map(noisy)
    opts = BAOptions(max_iterations=8, linear_solver="dense_schur",
                     function_tolerance=0.0)
    out_old, s_old = bundle_adjust(noisy, opts)
    # small caps + small max_entries exercise spill rows and class
    # chunk-splitting
    fast = add_cam_pair_tables(noisy, classes=(2, 8, 32),
                               max_entries=256)
    assert len(fast.cam_pair_tables) > 1
    out_new, s_new = bundle_adjust(fast, opts)
    np.testing.assert_allclose(float(s_new.final_cost),
                               float(s_old.final_cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_new.extrinsics),
                               np.asarray(out_old.extrinsics), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_new.points),
                               np.asarray(out_old.points), atol=1e-5)


def test_dense_schur_jit_and_padded(rng):
    from theiasfm_tpu.sfm.ba.bundle_adjustment import pad_ba_problem
    gt = make_ba_problem(rng, n_cams=5, n_pts=60)
    noisy = perturb(gt, rng)
    padded = pad_ba_problem(noisy, build_point_obs_map=True)
    opts = BAOptions(max_iterations=10, linear_solver="dense_schur",
                     point_indices_sorted=True, function_tolerance=0.0)
    run = jax.jit(lambda p: bundle_adjust(p, opts))
    out, summary = run(padded)
    assert float(summary.final_cost) < 1e-6 * float(summary.initial_cost)


def test_cg_forcing_and_precond_reuse_converge(rng):
    """cg_eta forcing (Ceres' eta-based inexact step) and
    stale-preconditioner reuse must not change where LM converges —
    both only trade per-iteration accuracy for speed, and the trust
    region absorbs the difference."""
    gt = make_ba_problem(rng)
    noisy = perturb(gt, rng)
    base = BAOptions(max_iterations=40, cg_iterations=60)
    _, s0 = bundle_adjust(noisy, base)
    fast = BAOptions(max_iterations=40, cg_iterations=60,
                     cg_eta=0.1, precond_reuse=True)
    _, s1 = bundle_adjust(noisy, fast)
    cost_before = float(ba_cost(noisy, base))
    assert float(s1.final_cost) < 1e-9 * cost_before, (
        float(s0.final_cost), float(s1.final_cost))
    # and the inexact config must land in the same basin as the exact
    # solve, not merely below an absolute threshold
    assert float(s1.final_cost) <= 1.05 * float(s0.final_cost) + 1e-12, (
        float(s0.final_cost), float(s1.final_cost))


def test_precond_reuse_matches_exact_with_bf16(rng):
    gt = make_ba_problem(rng, noise_pix=0.3)
    noisy = perturb(gt, rng)
    fast = BAOptions(max_iterations=30, cg_iterations=60,
                     cg_eta=0.1, precond_reuse=True, matvec_bf16=True)
    _, s = bundle_adjust(noisy, fast)
    exact = BAOptions(max_iterations=30, cg_iterations=60)
    _, s0 = bundle_adjust(noisy, exact)
    # same basin: final costs within a few percent of each other
    assert float(s.final_cost) <= 1.05 * float(s0.final_cost) + 1e-6, (
        float(s.final_cost), float(s0.final_cost))


def test_dense_schur_corr_reuse_converges(rng):
    """dense_schur with stale corr-block reuse on rejected steps must
    reach the same basin as the exact dense solve."""
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_cam_pair_tables, add_point_obs_map)
    gt = make_ba_problem(rng, n_cams=6, n_pts=80)
    noisy = perturb(gt, rng)
    noisy = add_cam_pair_tables(add_point_obs_map(noisy))
    base = BAOptions(max_iterations=40, linear_solver="dense_schur")
    _, s0 = bundle_adjust(noisy, base)
    fast = BAOptions(max_iterations=40, linear_solver="dense_schur",
                     precond_reuse=True)
    _, s1 = bundle_adjust(noisy, fast)
    cost_before = float(ba_cost(noisy, base))
    assert float(s1.final_cost) < 1e-9 * cost_before, (
        float(s0.final_cost), float(s1.final_cost))
    assert float(s1.final_cost) <= 1.05 * float(s0.final_cost) + 1e-12, (
        float(s0.final_cost), float(s1.final_cost))

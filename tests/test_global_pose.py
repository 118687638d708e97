"""Global pose estimation tests mirroring ref:
src/theia/sfm/global_pose_estimation/robust_rotation_estimator_test.cc,
nonlinear_position_estimator_test.cc,
filter_view_pairs_from_relative_translation_test.cc (synthetic view
graphs with noise/outliers)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm import global_pose as gp
from theiasfm_tpu.sfm.transformation import align_point_clouds


def make_view_graph(rng, n_views=20, edge_prob=0.5, rot_noise_deg=0.0,
                    n_outlier_edges=0):
    """Random global rotations/positions + pairwise measurements."""
    aa_gt = rng.normal(size=(n_views, 3)) * 0.5
    pos_gt = rng.normal(size=(n_views, 3)) * 3.0
    R_gt = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa_gt)))
    edges, rel_rot, rel_pos = [], [], []
    for i in range(n_views):
        for j in range(i + 1, n_views):
            if rng.uniform() > edge_prob and j != i + 1:
                continue
            edges.append((i, j))
            R_ij = R_gt[j] @ R_gt[i].T
            aa_ij = np.asarray(rot.rotation_matrix_to_angle_axis(
                jnp.asarray(R_ij)))
            if rot_noise_deg > 0:
                n = rng.normal(size=3)
                n = n / np.linalg.norm(n) * np.radians(
                    rng.normal(scale=rot_noise_deg))
                aa_ij = np.asarray(rot.multiply_rotations(
                    jnp.asarray(n), jnp.asarray(aa_ij)))
            rel_rot.append(aa_ij)
            # position of j in i's camera frame: R_i (c_j - c_i), unit
            d = R_gt[i] @ (pos_gt[j] - pos_gt[i])
            rel_pos.append(d / np.linalg.norm(d))
    edges = np.asarray(edges)
    rel_rot = np.stack(rel_rot)
    rel_pos = np.stack(rel_pos)
    # corrupt some edges
    idx = rng.choice(len(edges), n_outlier_edges, replace=False)
    for e in idx:
        rel_rot[e] = rng.normal(size=3)
        rp = rng.normal(size=3)
        rel_pos[e] = rp / np.linalg.norm(rp)
    return aa_gt, pos_gt, edges, rel_rot, rel_pos, idx


def rotation_errors_deg(aa_est, aa_gt):
    """Global-gauge-aligned rotation errors: R_err = R_est (R_align)^-1
    vs gt; compute via relative consistency instead (gauge-free):
    compare all relative rotations."""
    R_est = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(aa_est)))
    R_gt = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(aa_gt)))
    # align: S = R_est_0^T R_gt_0
    S = R_est[0].T @ R_gt[0]
    errs = []
    for k in range(len(aa_est)):
        E = R_est[k] @ S @ R_gt[k].T
        cos = np.clip((np.trace(E) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(cos)))
    return np.asarray(errs)


def test_mst_init_exact(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, _ = make_view_graph(rng)
    init = gp.orientations_from_mst(len(aa_gt), edges, rel_rot,
                                    np.ones(len(edges)))
    errs = rotation_errors_deg(init, aa_gt)
    assert np.max(errs) < 1e-3  # exact up to chained float conversions


def test_rotation_averaging_noisy(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, _ = make_view_graph(
        rng, rot_noise_deg=2.0)
    init = gp.orientations_from_mst(len(aa_gt), edges, rel_rot,
                                    np.ones(len(edges)))
    out = gp.robust_rotation_averaging(init, edges, rel_rot)
    errs_init = rotation_errors_deg(init, aa_gt)
    errs = rotation_errors_deg(out, aa_gt)
    # averaging must beat chaining down the MST
    assert np.mean(errs) < np.mean(errs_init)
    assert np.mean(errs) < 1.5, (np.mean(errs), np.mean(errs_init))


def test_rotation_averaging_outliers(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, bad = make_view_graph(
        rng, rot_noise_deg=0.5, n_outlier_edges=8)
    # MST may route through outlier edges; weight them low via noise --
    # but keep the test honest: init from identity-adjacent MST anyway
    init = gp.orientations_from_mst(len(aa_gt), edges, rel_rot,
                                    np.ones(len(edges)))
    out = gp.robust_rotation_averaging(init, edges, rel_rot)
    errs = rotation_errors_deg(out, aa_gt)
    assert np.median(errs) < 2.0, np.median(errs)


def test_position_nonlinear(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, _ = make_view_graph(rng)
    pos = gp.estimate_positions_nonlinear(aa_gt, edges, rel_pos)
    s, R, t = align_point_clouds(pos, pos_gt)
    err = np.linalg.norm(s * pos @ R.T + t - pos_gt, axis=1)
    scale = np.linalg.norm(pos_gt.std(0))
    assert np.median(err) < 0.02 * scale, (np.median(err), scale)


def test_position_lud_with_outliers(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, bad = make_view_graph(
        rng, n_outlier_edges=10)
    pos = gp.estimate_positions_lud(aa_gt, edges, rel_pos)
    s, R, t = align_point_clouds(pos, pos_gt)
    err = np.linalg.norm(s * pos @ R.T + t - pos_gt, axis=1)
    scale = np.linalg.norm(pos_gt.std(0))
    assert np.median(err) < 0.05 * scale, (np.median(err), scale)


def test_orientation_filter(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, bad = make_view_graph(
        rng, n_outlier_edges=6)
    keep = gp.filter_view_pairs_from_orientation(aa_gt, edges, rel_rot,
                                                 max_degrees=5.0)
    assert not keep[bad].any()
    good = np.ones(len(edges), bool)
    good[bad] = False
    assert keep[good].all()


def test_translation_filter(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, bad = make_view_graph(
        rng, n_outlier_edges=6)
    keep = gp.filter_view_pairs_from_relative_translation(
        aa_gt, edges, rel_pos)
    good = np.ones(len(edges), bool)
    good[bad] = False
    # most outliers dropped, most good edges kept
    assert keep[good].mean() > 0.8, keep[good].mean()
    assert keep[bad].mean() < 0.5, keep[bad].mean()


def test_linear_rotation_averaging(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, _ = make_view_graph(
        rng, rot_noise_deg=1.0)
    out = gp.linear_rotation_averaging(len(aa_gt), edges, rel_rot)
    errs = rotation_errors_deg(out, aa_gt)
    assert np.mean(errs) < 2.0, np.mean(errs)


def test_nonlinear_rotation_averaging(rng):
    aa_gt, pos_gt, edges, rel_rot, rel_pos, _ = make_view_graph(
        rng, rot_noise_deg=1.0)
    init = gp.orientations_from_mst(len(aa_gt), edges, rel_rot,
                                    np.ones(len(edges)))
    out = gp.nonlinear_rotation_averaging(init, edges, rel_rot)
    errs = rotation_errors_deg(out, aa_gt)
    assert np.mean(errs) < 1.0, np.mean(errs)

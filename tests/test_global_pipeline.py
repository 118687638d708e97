"""End-to-end global pipeline test (synthetic) — the global analog of
the incremental E2E gate (ref hybrid/incremental estimator tests)."""
import numpy as np
import pytest

from tests.test_incremental_pipeline import build_synthetic_scene
from theiasfm_tpu.sfm.pipeline import GlobalOptions, global_reconstruction
from theiasfm_tpu.sfm.transformation import align_point_clouds


@pytest.mark.slow
def test_global_end_to_end(rng):
    recon, graph, gt_extrs = build_synthetic_scene(rng, n_views=8)
    opts = GlobalOptions()
    summary = global_reconstruction(recon, graph, opts)
    assert summary["success"], summary
    assert summary["num_estimated_views"] == 8, summary
    assert summary["num_estimated_tracks"] > 100

    est_ids = sorted(recon.estimated_views())
    est_pos = np.stack([recon.views[v].camera.position for v in est_ids])
    gt_pos = gt_extrs[:, :3][np.asarray(est_ids)]
    s, R, t = align_point_clouds(est_pos, gt_pos)
    err = np.linalg.norm(s * est_pos @ R.T + t - gt_pos, axis=1)
    assert np.median(err) < 0.08, err


def test_global_linear_triplet(rng):
    """Full pipeline with the Jiang-Cui-Tan LINEAR_TRIPLET positions
    (ref: PositionEstimatorType::LINEAR_TRIPLET path of
    global_reconstruction_estimator.cc:404-436)."""
    recon, graph, gt_extrs = build_synthetic_scene(rng, n_views=8)
    opts = GlobalOptions(position_estimator="linear_triplet")
    summary = global_reconstruction(recon, graph, opts)
    assert summary["success"], summary
    assert summary["num_estimated_views"] == 8, summary
    est_ids = sorted(recon.estimated_views())
    est_pos = np.stack([recon.views[v].camera.position for v in est_ids])
    gt_pos = gt_extrs[:, :3][np.asarray(est_ids)]
    s, R, t = align_point_clouds(est_pos, gt_pos)
    err = np.linalg.norm(s * est_pos @ R.T + t - gt_pos, axis=1)
    assert np.median(err) < 0.08, err


def test_global_lud(rng):
    recon, graph, gt_extrs = build_synthetic_scene(rng, n_views=8)
    opts = GlobalOptions(position_estimator="lud")
    summary = global_reconstruction(recon, graph, opts)
    assert summary["success"], summary
    assert summary["num_estimated_views"] == 8
    est_ids = sorted(recon.estimated_views())
    est_pos = np.stack([recon.views[v].camera.position for v in est_ids])
    gt_pos = gt_extrs[:, :3][np.asarray(est_ids)]
    s, R, t = align_point_clouds(est_pos, gt_pos)
    err = np.linalg.norm(s * est_pos @ R.T + t - gt_pos, axis=1)
    assert np.median(err) < 0.08, err

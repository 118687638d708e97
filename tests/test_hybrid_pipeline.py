"""Hybrid pipeline E2E (ref hybrid_reconstruction_estimator_test.cc
pattern, on the synthetic scene)."""
import numpy as np
import pytest

from tests.test_incremental_pipeline import build_synthetic_scene
from theiasfm_tpu.sfm.pipeline import HybridOptions, hybrid_reconstruction
from theiasfm_tpu.sfm.transformation import align_point_clouds


@pytest.mark.slow
def test_hybrid_end_to_end(rng):
    recon, graph, gt_extrs = build_synthetic_scene(rng, n_views=8)
    summary = hybrid_reconstruction(recon, graph, HybridOptions())
    assert summary["success"], summary
    assert summary["num_estimated_views"] == 8, summary
    est_ids = sorted(recon.estimated_views())
    est_pos = np.stack([recon.views[v].camera.position for v in est_ids])
    gt_pos = gt_extrs[:, :3][np.asarray(est_ids)]
    s, R, t = align_point_clouds(est_pos, gt_pos)
    err = np.linalg.norm(s * est_pos @ R.T + t - gt_pos, axis=1)
    assert np.median(err) < 0.08, err

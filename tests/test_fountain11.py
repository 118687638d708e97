"""Fountain-11 end-to-end gate — mirrors ref:
src/theia/sfm/incremental_reconstruction_estimator_test.cc:60-155:
load the real Strecha fountain-11 fixture, reset estimated state,
rebuild from its (real SIFT) tracks, align to ground truth, and gate on
per-camera position error in meters (reference published median 2.0mm,
mean 2.4mm — BASELINE.md).

The reference test consumes a matches DB (absent from the repo's data);
we derive the two-view correspondences from the shared tracks instead,
which are the same verified SIFT features.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from theiasfm_tpu.io import read_theia_reconstruction
from theiasfm_tpu.sfm.pipeline import (IncrementalOptions,
                                       TwoViewInfoOptions,
                                       estimate_twoview_info,
                                       incremental_reconstruction)
from theiasfm_tpu.sfm.transformation import (align_point_clouds,
                                             align_reconstructions_robust)
from theiasfm_tpu.sfm.view_graph import ViewGraph

FOUNTAIN = "/root/reference/data/sfm/fountain11.bin"
GT = "/root/reference/data/sfm/gt_fountain11.bin"


def prepare_scene(max_pairs_corrs=2000):
    recon = read_theia_reconstruction(FOUNTAIN)
    # reset estimated state (poses + structure); keep intrinsics as the
    # calibration prior (the ref test does the same)
    for v in recon.views.values():
        v.is_estimated = False
        v.camera.extrinsics = np.zeros(6)
    for t in recon.tracks.values():
        t.is_estimated = False

    # derive pairwise correspondences from shared tracks
    vids = sorted(recon.views.keys())
    pair_corr = {}
    for i, v1 in enumerate(vids):
        f1 = recon.views[v1].features
        for v2 in vids[i + 1:]:
            f2 = recon.views[v2].features
            common = [t for t in f1 if t in f2]
            if len(common) >= 30:
                pair_corr[(v1, v2)] = (
                    np.stack([f1[t] for t in common]),
                    np.stack([f2[t] for t in common]))

    # batched two-view estimation: ALL pairs in one vmapped device call
    from theiasfm_tpu.sfm.pipeline.twoview import (
        estimate_twoview_info_batch)
    from theiasfm_tpu.utils import next_bucket

    pairs = sorted(pair_corr.keys())
    P = len(pairs)
    N = next_bucket(min(max(len(pair_corr[p][0]) for p in pairs),
                        max_pairs_corrs), 256)
    pix1 = np.zeros((P, N, 2))
    pix2 = np.zeros((P, N, 2))
    mask = np.zeros((P, N), bool)
    f1 = np.zeros(P); f2 = np.zeros(P)
    pp1 = np.zeros((P, 2)); pp2 = np.zeros((P, 2))
    for i, (v1, v2) in enumerate(pairs):
        a, b = pair_corr[(v1, v2)]
        if len(a) > N:
            sel = np.random.default_rng(0).choice(len(a), N,
                                                  replace=False)
            a, b = a[sel], b[sel]
        pix1[i, :len(a)] = a
        pix2[i, :len(b)] = b
        mask[i, :len(a)] = True
        cam1 = recon.views[v1].camera
        cam2 = recon.views[v2].camera
        f1[i], f2[i] = cam1.intrinsics[0], cam2.intrinsics[0]
        pp1[i] = cam1.intrinsics[3:5]
        pp2[i] = cam2.intrinsics[3:5]

    infos, inl = estimate_twoview_info_batch(
        jax.random.PRNGKey(3), pix1, pix2, mask, f1, f2, pp1, pp2,
        TwoViewInfoOptions())
    graph = ViewGraph()
    for i, (v1, v2) in enumerate(pairs):
        if infos[i] is not None and \
                infos[i].num_verified_matches >= 30:
            graph.add_edge(v1, v2, infos[i])
    return recon, graph


def _aligned_errors(recon):
    gt = read_theia_reconstruction(GT)
    est_pos, gt_pos = [], []
    for vid, v in recon.views.items():
        if not v.is_estimated:
            continue
        gvid = gt.view_id_from_name(v.name)
        gv = gt.view(gvid)
        est_pos.append(v.camera.position)
        gt_pos.append(gv.camera.position)
    est_pos = np.stack(est_pos)
    gt_pos = np.stack(gt_pos)
    s, R, t = align_reconstructions_robust(est_pos, gt_pos)
    return np.linalg.norm(s * est_pos @ R.T + t - gt_pos, axis=1)


@pytest.mark.slow
def test_fountain11_global():
    """Real-data gate for the GLOBAL pipeline on the fountain-11
    fixture (the reference gates incremental+hybrid on this fixture,
    incremental_reconstruction_estimator_test.cc:60-155 /
    hybrid_reconstruction_estimator_test.cc:155 with
    kPositionToleranceMeters = 1e-2; same bar here)."""
    from theiasfm_tpu.sfm.pipeline import (GlobalOptions,
                                           global_reconstruction)
    recon, graph = prepare_scene()
    summary = global_reconstruction(recon, graph, GlobalOptions())
    assert summary["success"], summary
    assert summary["num_estimated_views"] >= 10, summary
    err = _aligned_errors(recon)
    print(f"fountain11 global: median {np.median(err)*1000:.2f}mm "
          f"max {err.max()*1000:.2f}mm")
    assert np.median(err) < 0.010, f"median {np.median(err)*1000:.1f}mm"


@pytest.mark.slow
def test_fountain11_hybrid():
    """Real-data gate for the HYBRID pipeline
    (ref hybrid_reconstruction_estimator_test.cc:155-170,
    kPositionToleranceMeters = 1e-2)."""
    from theiasfm_tpu.sfm.pipeline import (HybridOptions,
                                           hybrid_reconstruction)
    recon, graph = prepare_scene()
    summary = hybrid_reconstruction(recon, graph, HybridOptions())
    assert summary["success"], summary
    assert summary["num_estimated_views"] >= 10, summary
    err = _aligned_errors(recon)
    print(f"fountain11 hybrid: median {np.median(err)*1000:.2f}mm "
          f"max {err.max()*1000:.2f}mm")
    assert np.median(err) < 0.010, f"median {np.median(err)*1000:.1f}mm"


@pytest.mark.slow
def test_fountain11_incremental():
    recon, graph = prepare_scene()
    summary = incremental_reconstruction(recon, graph,
                                         IncrementalOptions())
    assert summary["success"], summary
    assert summary["num_estimated_views"] == 11, summary

    gt = read_theia_reconstruction(GT)
    est_pos, gt_pos = [], []
    for vid, v in recon.views.items():
        if not v.is_estimated:
            continue
        gvid = gt.view_id_from_name(v.name)
        gv = gt.view(gvid)
        est_pos.append(v.camera.position)
        gt_pos.append(gv.camera.position)
    est_pos = np.stack(est_pos)
    gt_pos = np.stack(gt_pos)
    s, R, t = align_reconstructions_robust(est_pos, gt_pos)
    err = np.linalg.norm(s * est_pos @ R.T + t - gt_pos, axis=1)
    median_m = np.median(err)
    mean_m = np.mean(err)
    print(f"fountain11: median {median_m*1000:.2f}mm "
          f"mean {mean_m*1000:.2f}mm")
    # reference: median 2.0mm mean 2.4mm (performance.rst:45)
    assert median_m < 0.010, f"median {median_m*1000:.1f}mm"

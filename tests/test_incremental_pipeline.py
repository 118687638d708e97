"""End-to-end incremental pipeline test on a synthetic scene —
mirrors ref: src/theia/sfm/incremental_reconstruction_estimator_test.cc
(build from known matches, align to ground truth, gate on camera
position error)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.camera import models as cm
from theiasfm_tpu.sfm.pipeline import (IncrementalOptions,
                                       estimate_twoview_info,
                                       TwoViewInfoOptions,
                                       incremental_reconstruction)
from theiasfm_tpu.sfm.reconstruction import Reconstruction
from theiasfm_tpu.sfm.track_builder import TrackBuilder
from theiasfm_tpu.sfm.transformation import (align_point_clouds,
                                             align_reconstructions_robust)
from theiasfm_tpu.sfm.view_graph import ViewGraph


def build_synthetic_scene(rng, n_views=8, n_pts=150, noise=0.3,
                          focal=700.0):
    """Cameras on an arc looking at a point cloud; returns
    (reconstruction with views+tracks+observations, view_graph,
    gt_positions, gt_orientations)."""
    extrs = []
    for v in range(n_views):
        ang = 0.9 * (v / (n_views - 1) - 0.5)
        c = np.array([8 * np.sin(ang), 0.4 * rng.normal(),
                      -8 * np.cos(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        aa = np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))
        extrs.append(np.concatenate([c, aa]))
    extrs = np.stack(extrs)
    pts = rng.uniform(-2.5, 2.5, size=(n_pts, 3))

    intr = np.zeros(10)
    intr[0] = focal; intr[1] = 1.0; intr[3] = 500.0; intr[4] = 400.0

    recon = Reconstruction()
    vids = []
    for v in range(n_views):
        vid = recon.add_view(f"img{v}.jpg", group=0)
        view = recon.view(vid)
        view.camera.intrinsics = intr.copy()
        view.camera.image_width = 1000
        view.camera.image_height = 800
        vids.append(vid)

    # project all points into all views; keep in-image observations
    obs = {}  # (v, p) -> pixel
    for v in range(n_views):
        pix, depth = cm.project(cm.CameraModelType.PINHOLE,
                                jnp.asarray(extrs[v]), jnp.asarray(intr),
                                jnp.asarray(pts))
        pix = np.asarray(pix) + rng.normal(scale=noise, size=(n_pts, 2))
        d = np.asarray(depth)
        for p in range(n_pts):
            if d[p] > 0.5 and 0 <= pix[p, 0] < 1000 and \
                    0 <= pix[p, 1] < 800:
                obs[(v, p)] = pix[p]

    # tracks via the track builder from pairwise "matches"
    tb = TrackBuilder(min_track_length=2)
    for v1 in range(n_views):
        for v2 in range(v1 + 1, n_views):
            for p in range(n_pts):
                if (v1, p) in obs and (v2, p) in obs:
                    tb.add_feature_correspondence(
                        vids[v1], obs[(v1, p)], vids[v2], obs[(v2, p)])
    tb.build_tracks(recon)

    # view graph from two-view estimation
    graph = ViewGraph()
    key = jax.random.PRNGKey(7)
    tv_opts = TwoViewInfoOptions()
    for v1 in range(n_views):
        for v2 in range(v1 + 1, n_views):
            common = [(obs[(v1, p)], obs[(v2, p)]) for p in range(n_pts)
                      if (v1, p) in obs and (v2, p) in obs]
            if len(common) < 30:
                continue
            pix1 = jnp.asarray(np.stack([c[0] for c in common]))
            pix2 = jnp.asarray(np.stack([c[1] for c in common]))
            key, k = jax.random.split(key)
            info, inl = estimate_twoview_info(
                k, pix1, pix2, focal, focal, tv_opts,
                pp1=(500.0, 400.0), pp2=(500.0, 400.0))
            if info.num_verified_matches >= 30:
                graph.add_edge(vids[v1], vids[v2], info)

    return recon, graph, extrs


@pytest.mark.slow
def test_incremental_end_to_end(rng):
    recon, graph, gt_extrs = build_synthetic_scene(rng)
    opts = IncrementalOptions()
    summary = incremental_reconstruction(recon, graph, opts)
    assert summary["success"]
    assert summary["num_estimated_views"] == 8, summary
    assert summary["num_estimated_tracks"] > 100

    # align to ground truth (similarity) and check camera positions
    est_ids = sorted(recon.estimated_views())
    est_pos = np.stack([recon.views[v].camera.position for v in est_ids])
    gt_pos = gt_extrs[:, :3][np.asarray(est_ids)]
    s, R, t = align_point_clouds(est_pos, gt_pos)
    err = np.linalg.norm(est_pos * 0 + (s * est_pos @ R.T + t) - gt_pos,
                         axis=1)
    # scene scale ~8 units camera distance; gate at 1% of that
    assert np.median(err) < 0.08, err

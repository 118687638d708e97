"""Reconstruction-level BA entry points.

ref test model: bundle_adjustment_test.cc + the BundleAdjustView /
BundleAdjustTrack / BundleAdjustPartialReconstruction API surface
(bundle_adjustment.h:135-158).
"""
import numpy as np
import jax.numpy as jnp

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.ba.entry_points import (
    bundle_adjust_partial_reconstruction, bundle_adjust_reconstruction,
    bundle_adjust_track, bundle_adjust_view)
from theiasfm_tpu.sfm.reconstruction import Reconstruction, CameraModelType


def _make_recon(rng, V=6, N=80):
    positions = rng.uniform(-1, 1, (V, 3))
    orient = rng.uniform(-0.1, 0.1, (V, 3))
    pts = rng.uniform(-2, 2, (N, 3))
    pts[:, 2] += 8.0
    recon = Reconstruction()
    vids, Rs = [], np.asarray(
        rot.angle_axis_to_rotation_matrix(jnp.asarray(orient)))
    group = 77  # all views share intrinsics
    for i in range(V):
        vid = recon.add_view(f"v{i}", group=group)
        vids.append(vid)
        view = recon.views[vid]
        view.camera.model_type = CameraModelType.PINHOLE
        view.camera.intrinsics[0] = 600.0
        view.camera.intrinsics[3:5] = [320.0, 240.0]
        view.camera.extrinsics = np.concatenate([positions[i], orient[i]])
        view.is_estimated = True
    tids = []
    for p in pts:
        tid = recon.add_track()
        tids.append(tid)
        recon.tracks[tid].point = np.append(p, 1.0)
        recon.tracks[tid].is_estimated = True
    for i, vid in enumerate(vids):
        Xc = (Rs[i] @ (pts - positions[i]).T).T
        px = 600.0 * Xc[:, :2] / Xc[:, 2:3] + np.array([320.0, 240.0])
        for tid, p in zip(tids, px):
            recon.add_observation(vid, tid, p)
    return recon, vids, tids, positions, pts


def test_bundle_adjust_view_recovers_pose(rng):
    recon, vids, tids, positions, pts = _make_recon(rng)
    v = vids[2]
    true_extr = recon.views[v].camera.extrinsics.copy()
    recon.views[v].camera.extrinsics = true_extr + rng.normal(
        0, 0.02, 6)
    others = {u: recon.views[u].camera.extrinsics.copy()
              for u in vids if u != v}
    summary = bundle_adjust_view(recon, v)
    assert summary["final_cost"] < 1e-8, summary
    np.testing.assert_allclose(recon.views[v].camera.extrinsics,
                               true_extr, atol=1e-5)
    for u, e in others.items():  # constant blocks untouched
        np.testing.assert_allclose(recon.views[u].camera.extrinsics, e)


def test_bundle_adjust_track_recovers_point(rng):
    recon, vids, tids, positions, pts = _make_recon(rng)
    t = tids[5]
    true_pt = recon.tracks[t].point.copy()
    recon.tracks[t].point = true_pt + np.array([0.05, -0.03, 0.08, 0.0])
    cams = {u: recon.views[u].camera.extrinsics.copy() for u in vids}
    summary = bundle_adjust_track(recon, t)
    assert summary["final_cost"] < 1e-8, summary
    np.testing.assert_allclose(recon.tracks[t].xyz(), true_pt[:3],
                               atol=1e-5)
    for u, e in cams.items():
        np.testing.assert_allclose(recon.views[u].camera.extrinsics, e)


def test_bundle_adjust_partial(rng):
    recon, vids, tids, positions, pts = _make_recon(rng)
    var_views = vids[3:]
    fixed = {u: recon.views[u].camera.extrinsics.copy()
             for u in vids[:3]}
    for u in var_views:
        recon.views[u].camera.extrinsics += rng.normal(0, 0.01, 6)
    summary = bundle_adjust_partial_reconstruction(
        recon, var_views, None)
    assert summary["final_cost"] < summary["initial_cost"]
    assert summary["final_cost"] < 1e-6
    for u, e in fixed.items():
        np.testing.assert_allclose(recon.views[u].camera.extrinsics, e)


def test_bundle_adjust_reconstruction_full(rng):
    recon, vids, tids, positions, pts = _make_recon(rng)
    for u in vids[1:]:
        recon.views[u].camera.extrinsics += rng.normal(0, 0.005, 6)
    for t in tids:
        recon.tracks[t].point[:3] += rng.normal(0, 0.01, 3)
    summary = bundle_adjust_reconstruction(recon)
    assert summary["final_cost"] < 1e-6, summary

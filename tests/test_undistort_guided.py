"""Tests for undistortion and guided epipolar matching
(ref: undistort_image_test.cc, guided_epipolar_matcher_test.cc)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.camera.models import CameraModelType
from theiasfm_tpu.matching.guided_matcher import guided_epipolar_matching
from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.reconstruction import Camera, Reconstruction
from theiasfm_tpu.sfm.undistort import (undistort_points,
                                        undistort_reconstruction)


def make_distorted_camera():
    cam = Camera()
    cam.model_type = CameraModelType.PINHOLE
    cam.intrinsics[:7] = [600.0, 1.0, 0.0, 320.0, 240.0, 0.05, 0.01]
    cam.image_width, cam.image_height = 640, 480
    return cam


def test_undistort_points_inverts_distortion():
    from theiasfm_tpu.camera import models as cm
    cam = make_distorted_camera()
    intr = jnp.asarray(cam.intrinsics)
    # take undistorted normalized pts, distort, to pixels
    xy_u = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3,
                                                        (30, 2)))
    xy_d = cm.distort(int(cam.model_type), intr, xy_u)
    pix_d = np.asarray(cm._apply_calibration(intr, xy_d))
    pix_u = undistort_points(cam, pix_d)
    expected = np.asarray(cm._apply_calibration(intr, xy_u))
    np.testing.assert_allclose(pix_u, expected, atol=1e-6)


def test_undistort_reconstruction():
    recon = Reconstruction()
    v = recon.add_view("a.jpg")
    recon.views[v].camera = make_distorted_camera()
    t = recon.add_track()
    recon.add_observation(v, t, (100.0, 100.0))
    undistort_reconstruction(recon)
    cam = recon.views[v].camera
    assert not np.any(cam.intrinsics[5:])
    # feature moved (distortion was nonzero there)
    assert not np.allclose(recon.views[v].features[t], (100.0, 100.0))


def test_guided_epipolar_matching(rng):
    # geometry: two views of random points
    aa = np.array([0.1, -0.2, 0.15])
    t = np.array([1.0, 0.2, -0.1])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    f = 500.0
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(100, 3))
    p2 = pts @ R.T + t
    kp1 = (pts[:, :2] / pts[:, 2:]) * f
    kp2 = (p2[:, :2] / p2[:, 2:]) * f
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                   [-t[1], t[0], 0]])
    E = tx @ R
    Kinv = np.diag([1 / f, 1 / f, 1.0])
    F = Kinv.T @ E @ Kinv
    desc = rng.normal(size=(100, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    # same descriptors in both views + mild noise
    desc2 = desc + 0.05 * rng.normal(size=desc.shape).astype(np.float32)
    matched = np.zeros(100, bool)
    matched[:50] = True  # first half "already matched"
    idx2, valid = guided_epipolar_matching(
        jnp.asarray(F), jnp.asarray(kp1), jnp.asarray(kp2),
        jnp.asarray(desc), jnp.asarray(desc2),
        jnp.ones(100, bool), jnp.ones(100, bool),
        jnp.asarray(matched), jnp.asarray(matched))
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    assert not valid[:50].any()  # already-matched are skipped
    sel = np.nonzero(valid)[0]
    assert len(sel) > 30
    assert (idx2[sel] == sel).mean() > 0.95

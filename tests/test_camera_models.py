"""Camera model tests mirroring ref: src/theia/sfm/camera/*_test.cc
(project/unproject round trips per model, distortion invertibility)."""
import jax.numpy as jnp
import numpy as np
import pytest

from theiasfm_tpu import camera as cam
from theiasfm_tpu.camera.models import CameraModelType, pixel_to_world_ray

MODELS = [
    CameraModelType.PINHOLE,
    CameraModelType.PINHOLE_RADIAL_TANGENTIAL,
    CameraModelType.FISHEYE,
    CameraModelType.FOV,
    CameraModelType.DIVISION_UNDISTORTION,
]


def make_intrinsics(model):
    p = cam.default_intrinsics(focal=600.0, ppx=320.0, ppy=240.0)
    if model == CameraModelType.PINHOLE:
        p = p.at[5].set(0.01).at[6].set(0.001)
    elif model == CameraModelType.PINHOLE_RADIAL_TANGENTIAL:
        p = p.at[5].set(0.01).at[6].set(0.001).at[7].set(0.0001)
        p = p.at[8].set(0.001).at[9].set(0.002)
    elif model == CameraModelType.FISHEYE:
        p = p.at[5].set(0.01).at[6].set(0.001)
    elif model == CameraModelType.FOV:
        p = p.at[5].set(0.75)
    elif model == CameraModelType.DIVISION_UNDISTORTION:
        p = p.at[5].set(-1e-8 * 600**2)  # k in normalized units
    return p


@pytest.mark.parametrize("model", MODELS)
def test_distort_undistort_round_trip(model, rng):
    intr = make_intrinsics(model)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)))
    xy_d = cam.distort(model, intr, xy)
    xy_u = cam.undistort(model, intr, xy_d)
    np.testing.assert_allclose(np.asarray(xy_u), np.asarray(xy), atol=1e-8)


@pytest.mark.parametrize("model", MODELS)
def test_project_unproject_round_trip(model, rng):
    intr = make_intrinsics(model)
    extr = jnp.asarray(np.concatenate([
        rng.normal(size=3), 0.3 * rng.normal(size=3)]))
    # points in front of camera
    pts_cam = rng.uniform([-0.4, -0.4, 1.0], [0.4, 0.4, 8.0], size=(40, 3))
    pts_cam[:, :2] *= pts_cam[:, 2:3]
    # transform to world: X = R^T p_cam + c
    from theiasfm_tpu.math import rotation as rot
    R = np.asarray(rot.angle_axis_to_rotation_matrix(extr[3:6]))
    pts_world = jnp.asarray(pts_cam @ R + np.asarray(extr[:3]))

    pixel, depth = cam.project(model, extr, intr, pts_world)
    assert np.all(np.asarray(depth) > 0)
    origin, direction = pixel_to_world_ray(model, extr, intr, pixel)
    # the unprojected ray must pass through the original point
    to_pt = np.asarray(pts_world) - np.asarray(origin)
    to_pt /= np.linalg.norm(to_pt, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(direction), to_pt, atol=1e-6)


def test_project_batch_shape(rng):
    model = CameraModelType.PINHOLE
    intr = jnp.stack([make_intrinsics(model)] * 7)
    extr = jnp.asarray(np.concatenate(
        [rng.normal(size=(7, 3)), 0.2 * rng.normal(size=(7, 3))], axis=-1))
    pts = jnp.asarray(rng.normal(size=(7, 3)) + np.array([0, 0, 5.0]))
    pix, depth = cam.project_batch(model, extr, intr, pts)
    assert pix.shape == (7, 2) and depth.shape == (7,)


def test_projection_gradients_finite(rng):
    import jax
    model = CameraModelType.PINHOLE_RADIAL_TANGENTIAL
    intr = make_intrinsics(model)
    extr = jnp.asarray(np.concatenate([rng.normal(size=3),
                                       0.3 * rng.normal(size=3)]))
    pt = jnp.asarray(np.array([0.3, -0.2, 4.0]))

    def f(e, i, p):
        pix, _ = cam.project(model, e, i, p)
        return jnp.sum(pix)

    g = jax.grad(f, argnums=(0, 1, 2))(extr, intr, pt)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))

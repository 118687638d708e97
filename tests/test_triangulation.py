"""Triangulation tests mirroring ref:
src/theia/sfm/triangulation/triangulation_test.cc (random points in
frustum, noise-free exactness + noisy accuracy, cheirality, angles)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm import triangulation as tri


def make_scene(rng, n_views=4, n_pts=30):
    """Cameras on a ring looking at the origin; points near origin."""
    extr = []
    for v in range(n_views):
        ang = 2 * np.pi * v / max(n_views, 1) * 0.15
        c = np.array([6 * np.sin(ang), 0.5 * v, -6 * np.cos(ang) + 0.0])
        # look at origin: camera z axis towards origin
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->camera rows
        aa = np.asarray(rot.rotation_matrix_to_angle_axis(jnp.asarray(R)))
        extr.append(np.concatenate([c, aa]))
    extr = jnp.asarray(np.stack(extr))
    pts = jnp.asarray(rng.uniform(-1, 1, size=(n_pts, 3)))
    K = jnp.broadcast_to(jnp.asarray(np.diag([800.0, 800.0, 1.0])),
                         (n_views, 3, 3))
    Ps = tri.projection_matrix(extr, K)
    ptsh = jnp.concatenate([pts, jnp.ones((n_pts, 1))], axis=-1)
    proj = jnp.einsum("vij,nj->nvi", Ps, ptsh)
    pix = proj[..., :2] / proj[..., 2:]
    return extr, K, Ps, pts, pix


def test_dlt_exact(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=2)
    X = tri.triangulate_dlt(Ps[0], Ps[1], pix[:, 0], pix[:, 1])
    got = np.asarray(X[..., :3] / X[..., 3:])
    np.testing.assert_allclose(got, np.asarray(pts), atol=1e-8)


def test_nview_exact(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=5)
    Ps_b = jnp.broadcast_to(Ps, (pts.shape[0],) + Ps.shape)
    X = tri.triangulate_nview(Ps_b, pix)
    got = np.asarray(X[..., :3] / X[..., 3:])
    np.testing.assert_allclose(got, np.asarray(pts), atol=1e-8)


def test_nview_masked(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=5)
    # corrupt last 2 views' observations, mask them out
    pix = pix.at[:, 3:].add(500.0)
    mask = jnp.asarray([True, True, True, False, False])
    Ps_b = jnp.broadcast_to(Ps, (pts.shape[0],) + Ps.shape)
    mask_b = jnp.broadcast_to(mask, (pts.shape[0], 5))
    X = tri.triangulate_nview(Ps_b, pix, mask_b)
    got = np.asarray(X[..., :3] / X[..., 3:])
    np.testing.assert_allclose(got, np.asarray(pts), atol=1e-8)


def test_nview_noisy(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=6)
    pix = pix + jnp.asarray(rng.normal(scale=0.5, size=pix.shape))
    Ps_b = jnp.broadcast_to(Ps, (pts.shape[0],) + Ps.shape)
    X = tri.triangulate_nview(Ps_b, pix)
    got = np.asarray(X[..., :3] / X[..., 3:])
    err = np.linalg.norm(got - np.asarray(pts), axis=-1)
    assert np.median(err) < 0.05


def test_midpoint(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=4)
    origins = np.broadcast_to(np.asarray(extr[:, :3]), (pts.shape[0], 4, 3))
    rays = np.asarray(pts)[:, None, :] - origins
    rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    X = tri.triangulate_midpoint(jnp.asarray(origins), jnp.asarray(rays))
    got = np.asarray(X[..., :3] / X[..., 3:])
    np.testing.assert_allclose(got, np.asarray(pts), atol=1e-8)


def test_cheirality(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=3)
    ptsh = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1))], -1)
    extr_b = jnp.broadcast_to(extr, (pts.shape[0],) + extr.shape)
    assert np.all(np.asarray(tri.is_in_front_of_cameras(extr_b, ptsh)))
    behind = ptsh.at[:, 2].set(-50.0)
    assert not np.any(np.asarray(tri.is_in_front_of_cameras(extr_b, behind)))


def test_triangulation_angles(rng):
    extr, K, Ps, pts, pix = make_scene(rng, n_views=3)
    ptsh = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1))], -1)
    origins = jnp.broadcast_to(extr[:, :3], (pts.shape[0], 3, 3))
    ang = np.asarray(tri.triangulation_angles(origins, ptsh))
    assert np.all(ang > 2.0) and np.all(ang < 90.0)

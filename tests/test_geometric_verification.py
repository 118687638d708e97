"""Full two-view verification tests (ref:
two_view_match_geometric_verification_test.cc)."""
import jax
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import rotation as rot
from theiasfm_tpu.sfm.pipeline.geometric_verification import (
    GeometricVerificationOptions, verify_matches)


def test_verify_matches_full_stack(rng, key):
    focal = 600.0
    pp = (320.0, 240.0)
    aa = np.array([0.1, -0.15, 0.08])
    t = np.array([1.0, 0.2, -0.1])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(150, 3))
    p2 = pts @ R.T + t
    pix1 = pts[:, :2] / pts[:, 2:] * focal + pp
    pix2 = p2[:, :2] / p2[:, 2:] * focal + pp
    pix1 += rng.normal(scale=0.4, size=pix1.shape)
    # outliers
    pix1 = np.concatenate([pix1, rng.uniform(0, 640, (40, 2))])
    pix2 = np.concatenate([pix2, rng.uniform(0, 640, (40, 2))])

    info, corr = verify_matches(key, pix1, pix2, focal, focal, pp, pp)
    assert info is not None
    assert info.num_verified_matches >= 120
    assert corr.shape[1] == 4
    # pose accuracy after 2-view BA
    err = float(rot.rotation_error_deg(jnp.asarray(info.rotation_2),
                                       jnp.asarray(aa)))
    assert err < 0.5, err
    c2_true = -R.T @ (t / np.linalg.norm(t))
    ang = np.degrees(np.arccos(np.clip(abs(
        np.dot(info.position_2, c2_true)), -1, 1)))
    assert ang < 1.5, ang


def test_verify_rejects_garbage(rng, key):
    pix1 = rng.uniform(0, 640, (100, 2))
    pix2 = rng.uniform(0, 640, (100, 2))
    info, corr = verify_matches(key, pix1, pix2, 600.0, 600.0,
                                (320.0, 240.0), (320.0, 240.0))
    assert info is None or info.num_verified_matches < 60

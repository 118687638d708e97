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


def test_homography_inlier_degeneracy_flag(rng, key):
    """A planar / rotation-only pair must report a high homography
    inlier fraction, a general 3D pair a lower one — the signal the
    incremental seed ranking sorts by (ref CountHomographyInliers,
    two_view_match_geometric_verification.cc:328-363 and the ordering
    at incremental_reconstruction_estimator.cc:390-411)."""
    focal = 600.0
    pp = (320.0, 240.0)
    aa = np.array([0.05, -0.1, 0.04])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    t = np.array([1.0, 0.1, -0.05])

    # planar scene: all points on z = 6 plane
    plane = rng.uniform([-2, -2, 6], [2, 2, 6.0001], size=(150, 3))
    # general scene: deep frustum
    deep = rng.uniform([-2, -2, 4], [2, 2, 14], size=(150, 3))

    def project_pair(pts):
        p2 = pts @ R.T + t
        pix1 = pts[:, :2] / pts[:, 2:] * focal + pp
        pix2 = p2[:, :2] / p2[:, 2:] * focal + pp
        pix1 += rng.normal(scale=0.3, size=pix1.shape)
        return pix1, pix2

    k1, k2 = jax.random.split(key)
    i_plane, _ = verify_matches(k1, *project_pair(plane), focal, focal,
                                pp, pp, image_size1=(640, 480),
                                image_size2=(640, 480))
    i_deep, _ = verify_matches(k2, *project_pair(deep), focal, focal,
                               pp, pp, image_size1=(640, 480),
                               image_size2=(640, 480))
    assert i_plane is not None and i_deep is not None
    frac_plane = (i_plane.num_homography_inliers /
                  max(i_plane.num_verified_matches, 1))
    frac_deep = (i_deep.num_homography_inliers /
                 max(i_deep.num_verified_matches, 1))
    assert frac_plane > 0.85, frac_plane
    assert frac_deep < 0.6, frac_deep


def test_seed_pair_ordering_prefers_non_degenerate():
    """_order_initial_pairs sorts by (h_inliers, -verified)."""
    from theiasfm_tpu.sfm.pipeline.incremental import (
        IncrementalOptions, _order_initial_pairs)
    from theiasfm_tpu.sfm.reconstruction import Reconstruction
    from theiasfm_tpu.sfm.view_graph import TwoViewInfo, ViewGraph

    recon = Reconstruction()
    graph = ViewGraph()
    vids = [recon.add_view(f"v{i}") for i in range(3)]
    graph.add_edge(vids[0], vids[1], TwoViewInfo(
        num_verified_matches=200, num_homography_inliers=190))
    graph.add_edge(vids[1], vids[2], TwoViewInfo(
        num_verified_matches=150, num_homography_inliers=20))
    graph.add_edge(vids[0], vids[2], TwoViewInfo(
        num_verified_matches=180, num_homography_inliers=20))
    ordered = _order_initial_pairs(recon, graph, IncrementalOptions())
    # fewest homography inliers first; ties by more verified matches
    assert ordered[0] == (vids[0], vids[2])
    assert ordered[1] == (vids[1], vids[2])
    assert ordered[2] == (vids[0], vids[1])


def test_verify_rejects_garbage(rng, key):
    pix1 = rng.uniform(0, 640, (100, 2))
    pix2 = rng.uniform(0, 640, (100, 2))
    info, corr = verify_matches(key, pix1, pix2, 600.0, 600.0,
                                (320.0, 240.0), (320.0, 240.0))
    assert info is None or info.num_verified_matches < 60


def _synth_pair(rng, n_pts=150, n_out=40, noise=0.4):
    focal = 600.0
    pp = (320.0, 240.0)
    aa = np.array([0.1, -0.15, 0.08])
    t = np.array([1.0, 0.2, -0.1])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n_pts, 3))
    p2 = pts @ R.T + t
    pix1 = pts[:, :2] / pts[:, 2:] * focal + pp
    pix2 = p2[:, :2] / p2[:, 2:] * focal + pp
    pix1 += rng.normal(scale=noise, size=pix1.shape)
    pix1 = np.concatenate([pix1, rng.uniform(0, 640, (n_out, 2))])
    pix2 = np.concatenate([pix2, rng.uniform(0, 640, (n_out, 2))])
    return pix1, pix2, focal, pp, aa


def test_verify_batch_visibility_score_and_ba_flag(rng, key):
    """Batched path: visibility_score is populated from the pyramid
    when image sizes are known (ref estimate_twoview_info.cc:215-229),
    falls back to the inlier count without them, and
    bundle_adjustment=False is honored (advisor r4)."""
    from theiasfm_tpu.sfm.pipeline.geometric_verification import (
        verify_matches_batch)

    pix1, pix2, focal, pp, aa = _synth_pair(rng)
    n = len(pix1)
    P = 2
    b_pix1 = np.stack([pix1] * P)
    b_pix2 = np.stack([pix2] * P)
    mask = np.ones((P, n), bool)
    f = np.full(P, focal)
    pps = np.tile(np.asarray(pp), (P, 1))
    sizes = np.array([[[640, 480], [640, 480]],
                      [[0, 0], [0, 0]]], float)

    infos, corrs = verify_matches_batch(
        key, b_pix1, b_pix2, mask, f, f, pps, pps, sizes)
    assert infos[0] is not None and infos[1] is not None
    # pyramid score: both views spread over many cells -> score well
    # above the raw inlier count; unknown sizes -> exactly the count
    assert infos[0].visibility_score > infos[0].num_verified_matches
    assert infos[1].visibility_score == infos[1].num_verified_matches

    no_ba = GeometricVerificationOptions(bundle_adjustment=False)
    infos2, _ = verify_matches_batch(
        key, b_pix1, b_pix2, mask, f, f, pps, pps, sizes, no_ba)
    assert infos2[0] is not None
    err = float(rot.rotation_error_deg(
        jnp.asarray(infos2[0].rotation_2), jnp.asarray(aa)))
    assert err < 2.0, err


def test_verify_batch_guided_grows_matches(rng, key):
    """Batched guided matching (ref
    two_view_match_geometric_verification.h:53-120 step 2): features
    withheld from the putative set but present in the full arrays are
    recovered along epipolar lines, growing num_verified_matches."""
    from theiasfm_tpu.sfm.pipeline.geometric_verification import (
        verify_matches_batch)

    pix1, pix2, focal, pp, aa = _synth_pair(rng, n_pts=200, n_out=20)
    n_putative = 120   # withhold 80 true correspondences + outliers
    b_pix1 = pix1[None, :n_putative]
    b_pix2 = pix2[None, :n_putative]
    mask = np.ones((1, n_putative), bool)
    f = np.full(1, focal)
    pps = np.asarray(pp)[None]
    sizes = np.array([[[640, 480], [640, 480]]], float)

    # full feature arrays: every true point is a feature in both
    # images, with random-but-consistent descriptors so the ratio test
    # is decisive for true pairs
    n_feat = 220
    D = 32
    desc = rng.normal(size=(n_feat, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    kp1 = pix1[:n_feat]
    kp2 = pix2[:n_feat]
    fm = np.ones((1, n_feat), bool)

    opts = GeometricVerificationOptions(guided_matching=True)
    infos_g, corrs_g = verify_matches_batch(
        key, b_pix1, b_pix2, mask, f, f, pps, pps, sizes, opts,
        kp1_all=kp1[None], kp2_all=kp2[None],
        desc1=desc[None], desc2=desc[None], fmask1=fm, fmask2=fm)
    infos, corrs = verify_matches_batch(
        key, b_pix1, b_pix2, mask, f, f, pps, pps, sizes)
    assert infos[0] is not None and infos_g[0] is not None
    # guided pass must recover a solid fraction of the 100 withheld
    # true correspondences (120 putative - 20 withheld-range overlap)
    grown = (infos_g[0].num_verified_matches -
             infos[0].num_verified_matches)
    assert grown >= 40, (infos_g[0].num_verified_matches,
                         infos[0].num_verified_matches)
    assert corrs_g[0].shape[0] == infos_g[0].num_verified_matches
    # pose stays accurate with the grown set
    err = float(rot.rotation_error_deg(
        jnp.asarray(infos_g[0].rotation_2), jnp.asarray(aa)))
    assert err < 0.5, err

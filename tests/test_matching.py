"""Matching tests mirroring ref:
src/theia/matching/brute_force_feature_matcher_test.cc,
cascade_hasher_test.cc, in_memory_features_and_matches_database tests
(synthetic descriptors with known correspondence; ratio/symmetry
behavior; DB round trips)."""
import numpy as np
import jax.numpy as jnp
import pytest

from theiasfm_tpu.matching import (CascadeHasher,
                                   DiskFeaturesAndMatchesDatabase,
                                   FeatureMatcher, FeatureMatcherOptions,
                                   ImagePairMatch,
                                   InMemoryFeaturesAndMatchesDatabase,
                                   KeypointsAndDescriptors,
                                   match_descriptors)
from theiasfm_tpu.sfm.reconstruction import CameraIntrinsicsPrior


def make_descriptors(rng, n=200, d=128):
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    return desc


def test_brute_force_exact_match(rng):
    d1 = make_descriptors(rng)
    perm = rng.permutation(200)
    d2 = d1[perm] + 0.01 * rng.normal(size=d1.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    idx2, valid, dist = match_descriptors(jnp.asarray(d1),
                                          jnp.asarray(d2))
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    # the correct match for row i is where perm == i
    inv = np.argsort(perm)
    assert valid.mean() > 0.95
    assert (idx2[valid] == inv[valid]).all()


def test_brute_force_ratio_rejects_ambiguous(rng):
    d1 = make_descriptors(rng, n=10)
    # descriptor 0 duplicated in d2 -> ambiguous, must fail ratio
    d2 = np.concatenate([d1, d1[:1]])  # exact duplicate -> ambiguous
    idx2, valid, _ = match_descriptors(jnp.asarray(d1), jnp.asarray(d2))
    assert not bool(np.asarray(valid)[0])
    assert np.asarray(valid)[1:].all()


def test_brute_force_masks(rng):
    d1 = make_descriptors(rng, n=64)
    d2 = np.asarray(d1)
    m2 = np.ones(64, bool)
    m2[10] = False  # descriptor 10 padded out
    idx2, valid, _ = match_descriptors(jnp.asarray(d1), jnp.asarray(d2),
                                       mask2=jnp.asarray(m2))
    assert not bool(np.asarray(valid)[10])


def test_cascade_hasher_matches_brute_force(rng):
    d1 = make_descriptors(rng, n=300)
    perm = rng.permutation(300)
    d2 = d1[perm] + 0.005 * rng.normal(size=d1.shape).astype(np.float32)
    mean = np.concatenate([d1, d2]).mean(0)
    hasher = CascadeHasher(128, seed=1, num_candidates=16)
    idx2, valid, _ = hasher.match(jnp.asarray(d1), jnp.asarray(d2),
                                  jnp.asarray(mean))
    idx2, valid = np.asarray(idx2), np.asarray(valid)
    inv = np.argsort(perm)
    assert valid.mean() > 0.9
    assert (idx2[valid] == inv[valid]).mean() > 0.99


@pytest.mark.parametrize("db_kind", ["memory", "disk"])
def test_database_round_trip(tmp_path, rng, db_kind):
    db = (InMemoryFeaturesAndMatchesDatabase() if db_kind == "memory"
          else DiskFeaturesAndMatchesDatabase(str(tmp_path)))
    f = KeypointsAndDescriptors(
        image_name="a.jpg",
        keypoints=rng.normal(size=(50, 4)),
        descriptors=rng.normal(size=(50, 128)).astype(np.float32))
    db.put_features("a.jpg", f)
    assert db.contains_features("a.jpg")
    g = db.get_features("a.jpg")
    np.testing.assert_allclose(g.descriptors, f.descriptors)
    assert db.image_names_of_features() == ["a.jpg"]

    prior = CameraIntrinsicsPrior(image_width=640, image_height=480,
                                  focal_length=500.0)
    db.put_intrinsics_prior("a.jpg", prior)
    p = db.get_intrinsics_prior("a.jpg")
    assert p.focal_length == 500.0 and p.image_width == 640

    m = ImagePairMatch(image1="a.jpg", image2="b.jpg",
                       correspondences=rng.normal(size=(40, 4)))
    db.put_match("a.jpg", "b.jpg", m)
    got = db.get_match("a.jpg", "b.jpg")
    np.testing.assert_allclose(got.correspondences, m.correspondences)
    assert db.image_pairs_of_matches() == [("a.jpg", "b.jpg")]


def test_feature_matcher_end_to_end(rng):
    """Synthetic two-view scene -> features -> matcher -> verified match
    with geometric verification (the batched replacement for ref
    feature_matcher.cc MatchAndVerifyImagePairs)."""
    from theiasfm_tpu.math import rotation as rot
    focal, pp = 600.0, (320.0, 240.0)
    aa = np.array([0.1, -0.15, 0.05])
    t = np.array([1.0, 0.1, 0.2])
    R = np.asarray(rot.angle_axis_to_rotation_matrix(jnp.asarray(aa)))
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(300, 3))
    p2 = pts @ R.T + t
    pix1 = pts[:, :2] / pts[:, 2:] * focal + pp
    pix2 = p2[:, :2] / p2[:, 2:] * focal + pp
    desc = make_descriptors(rng, n=300)

    db = InMemoryFeaturesAndMatchesDatabase()
    kp1 = np.concatenate([pix1, np.ones((300, 2))], -1)
    kp2 = np.concatenate([pix2, np.ones((300, 2))], -1)
    db.put_features("im1", KeypointsAndDescriptors("im1", kp1, desc))
    # shuffle second image's features
    perm = rng.permutation(300)
    db.put_features("im2", KeypointsAndDescriptors(
        "im2", kp2[perm], desc[perm] +
        0.01 * rng.normal(size=desc.shape).astype(np.float32)))
    prior = CameraIntrinsicsPrior(image_width=640, image_height=480,
                                  focal_length=focal,
                                  principal_point=pp)
    db.put_intrinsics_prior("im1", prior)
    db.put_intrinsics_prior("im2", prior)

    matcher = FeatureMatcher(FeatureMatcherOptions(), db)
    matcher.add_images(["im1", "im2"])
    n = matcher.match_images()
    assert n == 1
    m = db.get_match("im1", "im2")
    assert m.twoview_info.num_verified_matches > 250
    # matching is resumable: second call does nothing
    assert matcher.match_images() == 0

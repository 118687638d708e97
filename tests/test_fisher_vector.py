"""Fisher vector tests (ref: fisher_vector_extractor_test.cc pattern:
similar images produce similar global descriptors)."""
import numpy as np

from theiasfm_tpu.matching.fisher_vector import (
    FisherVectorExtractor, FisherVectorOptions,
    select_image_pairs_from_global_descriptors)


def test_fisher_vector_similarity(rng):
    # three "image" descriptor sets: A and A' similar, B different
    centers = rng.normal(size=(8, 32)) * 3
    def make(center_ids, n=300, noise=0.3):
        ids = rng.choice(center_ids, n)
        return (centers[ids] +
                rng.normal(scale=noise, size=(n, 32))).astype(np.float32)

    descA = make([0, 1, 2, 3])
    descA2 = make([0, 1, 2, 3])
    descB = make([4, 5, 6, 7])

    fv = FisherVectorExtractor(FisherVectorOptions(num_gmm_clusters=8))
    fv.train(np.concatenate([descA, descB]))
    gA = fv.extract_global_descriptor(descA)
    gA2 = fv.extract_global_descriptor(descA2)
    gB = fv.extract_global_descriptor(descB)
    assert np.linalg.norm(gA) - 1.0 < 1e-5
    assert gA @ gA2 > gA @ gB + 0.2, (gA @ gA2, gA @ gB)


def test_pair_selection(rng):
    # clusters of mutually similar images
    g = {}
    for c in range(3):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        for i in range(4):
            v = base + 0.1 * rng.normal(size=64)
            g[f"c{c}_{i}"] = v / np.linalg.norm(v)
    pairs = select_image_pairs_from_global_descriptors(
        g, num_nearest_neighbors=3, use_query_expansion=False)
    # most pairs should be intra-cluster
    intra = sum(1 for a, b in pairs if a[:2] == b[:2])
    assert intra / len(pairs) > 0.8

"""Feature matching orchestrator: batch pairs -> device -> verified
matches in the database.

ref: src/theia/matching/feature_matcher.{h,cc} — AddImages /
SetImagePairsToMatch / MatchImages, with geometric verification and
DB storage per pair (feature_matcher.cc:116-133). Where the reference
chunks <=20 pairs onto a thread pool, this batches pairs into padded
device calls (brute-force MXU or cascade-hashing kernels) and runs
5-pt RANSAC verification per pair.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sfm.pipeline.twoview import TwoViewInfoOptions, estimate_twoview_info
from ..utils import next_bucket
from .brute_force import match_descriptors_batch
from .cascade_hasher import CascadeHasher
from .database import (FeaturesAndMatchesDatabase, ImagePairMatch)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class FeatureMatcherOptions:
    """ref: matching/feature_matcher_options.h."""
    lowes_ratio: float = 0.8
    guided_matching: bool = False
    keep_only_symmetric_matches: bool = True
    min_num_feature_matches: int = 30
    perform_geometric_verification: bool = True
    matcher: str = "brute_force"  # 'brute_force' | 'cascade_hashing'
    # pairs per device batch: matching AND geometric verification ride
    # one vmapped dispatch per chunk, so bigger chunks amortize the
    # dispatch latency (32 covers an 8-image all-pairs run in one)
    pair_batch_size: int = 32
    geometric_verification: TwoViewInfoOptions = TwoViewInfoOptions()
    seed: int = 0


class FeatureMatcher:
    """ref FeatureMatcher base + CascadeHashingFeatureMatcher."""

    def __init__(self, options: FeatureMatcherOptions,
                 db: FeaturesAndMatchesDatabase):
        self.options = options
        self.db = db
        self._names: List[str] = []
        self._pairs: Optional[List[Tuple[str, str]]] = None
        self._hasher: Optional[CascadeHasher] = None

    def add_image(self, name: str):
        if name not in self._names:
            self._names.append(name)

    def add_images(self, names):
        for n in names:
            self.add_image(n)

    def set_image_pairs_to_match(self, pairs):
        self._pairs = list(pairs)

    def match_images(self) -> int:
        """Match all pairs (or the configured subset). Returns number of
        verified pairs stored."""
        pairs = self._pairs
        if pairs is None:
            pairs = [(a, b) for i, a in enumerate(self._names)
                     for b in self._names[i + 1:]]
        # resume: skip pairs already in the DB (ref front-end resume)
        pairs = [p for p in pairs
                 if self.db.get_match(p[0], p[1]) is None]
        if not pairs:
            return 0

        key = jax.random.PRNGKey(self.options.seed)
        n_verified = 0
        B = self.options.pair_batch_size
        for start in range(0, len(pairs), B):
            chunk = pairs[start:start + B]
            key, k = jax.random.split(key)
            n_verified += self._match_chunk(chunk, k)
        return n_verified

    def _match_chunk(self, chunk, key) -> int:
        feats = {}
        for (a, b) in chunk:
            for n in (a, b):
                if n not in feats:
                    feats[n] = self.db.get_features(n)
        max_n = next_bucket(max(f.descriptors.shape[0]
                                for f in feats.values()), 128)
        D = next(iter(feats.values())).descriptors.shape[1]

        P = len(chunk)
        d1 = np.zeros((P, max_n, D), np.float32)
        d2 = np.zeros((P, max_n, D), np.float32)
        kp1p = np.zeros((P, max_n, 4))
        kp2p = np.zeros((P, max_n, 4))
        m1 = np.zeros((P, max_n), bool)
        m2 = np.zeros((P, max_n), bool)
        for i, (a, b) in enumerate(chunk):
            fa, fb = feats[a], feats[b]
            na, nb = fa.descriptors.shape[0], fb.descriptors.shape[0]
            d1[i, :na] = fa.descriptors
            d2[i, :nb] = fb.descriptors
            kp1p[i, :na] = fa.keypoints[:, :4]
            kp2p[i, :nb] = fb.keypoints[:, :4]
            m1[i, :na] = True
            m2[i, :nb] = True

        use_pallas = (self.options.matcher == "brute_force" and
                      jax.default_backend() not in ("cpu",) and
                      max_n >= 2048)
        if use_pallas:
            # ONE fused Pallas launch for the whole pair batch (the
            # grid leads with the pair axis; 26x the jnp matcher at 8k
            # descriptors per-pair, and batching keeps the MXU busy on
            # small images); symmetry via a batched reverse pass
            from .pallas_matcher import match_descriptors_pallas_batch
            idx2, valid, _ = match_descriptors_pallas_batch(
                jnp.asarray(d1), jnp.asarray(d2),
                jnp.asarray(m1), jnp.asarray(m2),
                lowes_ratio=self.options.lowes_ratio,
                symmetric=self.options.keep_only_symmetric_matches)
        elif self.options.matcher == "cascade_hashing":
            if self._hasher is None:
                self._hasher = CascadeHasher(D, seed=self.options.seed)
            mean = np.concatenate([d1.reshape(-1, D)[m1.reshape(-1)],
                                   d2.reshape(-1, D)[m2.reshape(-1)]]
                                  ).mean(0)
            idx2, valid, _ = jax.vmap(
                lambda a, b, ma, mb: self._hasher.match(
                    a, b, jnp.asarray(mean), ma, mb,
                    self.options.lowes_ratio))(
                jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1),
                jnp.asarray(m2))
        else:
            idx2, valid, _ = match_descriptors_batch(
                jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1),
                jnp.asarray(m2), lowes_ratio=self.options.lowes_ratio,
                symmetric=self.options.keep_only_symmetric_matches)
        idx2 = np.asarray(idx2)
        valid = np.asarray(valid)

        # collect putative matches per pair
        putative = []   # (pair_idx, a, b, corr (Mi, 4))
        for i, (a, b) in enumerate(chunk):
            sel = np.nonzero(valid[i])[0]
            if len(sel) < self.options.min_num_feature_matches:
                continue
            kp1 = feats[a].keypoints[sel]
            kp2 = feats[b].keypoints[idx2[i][sel]]
            corr = np.concatenate([kp1[:, :2], kp2[:, :2]], axis=-1)
            putative.append((i, a, b, corr))
        if not putative:
            return 0

        n_verified = 0
        if not self.options.perform_geometric_verification:
            from ..sfm.view_graph import TwoViewInfo
            for i, a, b, corr in putative:
                info = TwoViewInfo(num_verified_matches=len(corr))
                self.db.put_match(a, b, ImagePairMatch(
                    image1=a, image2=b, twoview_info=info,
                    correspondences=corr))
                n_verified += 1
            return n_verified

        gv_base = dict(
            estimate_twoview_info=self.options.geometric_verification,
            min_num_inlier_matches=self.options
            .min_num_feature_matches,
            guided_matching=self.options.guided_matching)
        from ..sfm.pipeline.geometric_verification import (
            GeometricVerificationOptions, verify_matches_batch)

        # ONE batched dispatch verifies every pair in the chunk
        # (5-pt RANSAC + homography count + optional guided epipolar
        # matching + 2-view BA + triangulation gates; the per-pair
        # host loop paid ~7 dispatches per pair)
        Pn = len(putative)
        maxm = next_bucket(max(len(c) for _, _, _, c in putative), 64)
        pix1 = np.zeros((Pn, maxm, 2))
        pix2 = np.zeros((Pn, maxm, 2))
        pmask = np.zeros((Pn, maxm), bool)
        f1s = np.zeros(Pn)
        f2s = np.zeros(Pn)
        pp1s = np.zeros((Pn, 2))
        pp2s = np.zeros((Pn, 2))
        sizes = np.zeros((Pn, 2, 2))
        for j, (i, a, b, corr) in enumerate(putative):
            n = len(corr)
            pix1[j, :n] = corr[:, :2]
            pix2[j, :n] = corr[:, 2:]
            pmask[j, :n] = True
            prior1 = self.db.get_intrinsics_prior(a)
            prior2 = self.db.get_intrinsics_prior(b)
            f1s[j], pp1s[j] = _focal_pp(prior1)
            f2s[j], pp2s[j] = _focal_pp(prior2)
            sizes[j, 0] = _image_size(prior1) or (0, 0)
            sizes[j, 1] = _image_size(prior2) or (0, 0)
        key, k = jax.random.split(key)
        from ..utils import count_dispatch
        count_dispatch("verify_pairs_batch")
        gv = GeometricVerificationOptions(**gv_base)
        guided_kw = {}
        if self.options.guided_matching:
            # guided matching grows the match set from ALL features —
            # ship the chunk's padded kp/desc arrays with the batch
            sel = [i for i, _, _, _ in putative]
            guided_kw = dict(
                kp1_all=kp1p[sel], kp2_all=kp2p[sel],
                desc1=d1[sel], desc2=d2[sel],
                fmask1=m1[sel], fmask2=m2[sel])
        infos, corrs = verify_matches_batch(
            k, pix1, pix2, pmask, f1s, f2s, pp1s, pp2s, sizes, gv,
            **guided_kw)
        for j, (i, a, b, _) in enumerate(putative):
            if infos[j] is None:
                continue
            self.db.put_match(a, b, ImagePairMatch(
                image1=a, image2=b, twoview_info=infos[j],
                correspondences=corrs[j]))
            n_verified += 1
        return n_verified


def _image_size(prior):
    if prior is None or not (prior.image_width or prior.image_height):
        return None
    return (prior.image_width, prior.image_height)


def _focal_pp(prior):
    if prior is None:
        return 1000.0, (0.0, 0.0)
    if prior.focal_length:
        f = prior.focal_length
    elif prior.image_width:
        f = 1.2 * max(prior.image_width, prior.image_height)
    else:
        f = 1000.0
    if prior.principal_point:
        pp = prior.principal_point
    else:
        pp = (prior.image_width / 2.0, prior.image_height / 2.0)
    return f, pp

"""Track building: union-find over (view, feature) correspondences.

ref: src/theia/sfm/track_builder.{h,cc} — connected components over
feature matches, enforcing min/max track length and dropping tracks
that observe the same view twice (inconsistent).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..math.graph import UnionFind
from .reconstruction import Reconstruction


class TrackBuilder:
    def __init__(self, min_track_length: int = 2,
                 max_track_length: int = 10 ** 9):
        self.min_track_length = min_track_length
        self.max_track_length = max_track_length
        self._feature_index: Dict[Tuple[int, Tuple[float, float]], int] = {}
        self._features: List[Tuple[int, np.ndarray]] = []
        self._pairs: List[Tuple[int, int]] = []

    def _feature_id(self, view_id: int, feature) -> int:
        key = (view_id, (float(feature[0]), float(feature[1])))
        fid = self._feature_index.get(key)
        if fid is None:
            fid = len(self._features)
            self._feature_index[key] = fid
            self._features.append((view_id, np.asarray(feature, float)))
        return fid

    def add_feature_correspondence(self, view1: int, feature1,
                                   view2: int, feature2):
        """ref: TrackBuilder::AddFeatureCorrespondence."""
        f1 = self._feature_id(view1, feature1)
        f2 = self._feature_id(view2, feature2)
        self._pairs.append((f1, f2))

    def build_tracks(self, reconstruction: Reconstruction) -> int:
        """Union-find over features -> tracks added to `reconstruction`.
        Returns number of tracks created (consistent, length-filtered).
        ref: TrackBuilder::BuildTracks (track_builder.cc:57+)."""
        n = len(self._features)
        groups: Dict[int, List[int]] = {}
        labels = None
        if self._pairs:
            from ..utils.native import connected_components_native
            pairs = np.asarray(self._pairs, np.int64)
            labels = connected_components_native(n, pairs[:, 0],
                                                 pairs[:, 1])
        if labels is not None:
            for i in range(n):
                groups.setdefault(int(labels[i]), []).append(i)
        else:
            uf = UnionFind(n)
            for a, b in self._pairs:
                uf.union(a, b)
            for i in range(n):
                groups.setdefault(uf.find(i), []).append(i)

        num_inconsistent = 0
        num_small = 0
        created = 0
        for members in groups.values():
            if len(members) < self.min_track_length:
                num_small += 1
                continue
            views = [self._features[m][0] for m in members]
            if len(set(views)) != len(views):
                num_inconsistent += 1
                continue
            members = members[: self.max_track_length]
            tid = reconstruction.add_track()
            for m in members:
                vid, feat = self._features[m]
                reconstruction.add_observation(vid, tid, feat)
            created += 1
        return created

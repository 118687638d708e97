"""Visibility pyramid: COLMAP-style next-best-view scoring.

ref: src/theia/sfm/visibility_pyramid.{h,cc}:44-70 — a multi-level
occupancy pyramid over the image; a view's score sums, over levels,
(number of occupied cells) * (cells per side), rewarding many
well-spread observations. Used to rank views for localization.
"""
from __future__ import annotations

import numpy as np


class VisibilityPyramid:
    def __init__(self, width: int, height: int, num_levels: int = 6):
        self.width = max(width, 1)
        self.height = max(height, 1)
        self.num_levels = num_levels
        self.grids = [np.zeros((2 ** lv, 2 ** lv), dtype=np.int32)
                      for lv in range(1, num_levels + 1)]

    def add_point(self, x: float, y: float):
        fx = min(max(x / self.width, 0.0), 1.0 - 1e-9)
        fy = min(max(y / self.height, 0.0), 1.0 - 1e-9)
        for g in self.grids:
            n = g.shape[0]
            g[int(fy * n), int(fx * n)] += 1

    def compute_score(self) -> int:
        score = 0
        for g in self.grids:
            score += int((g > 0).sum()) * g.shape[0]
        return score


def view_visibility_score(recon, view_id) -> int:
    """Score a view by its observations of ESTIMATED tracks (ref
    FindViewsToLocalize ranking in the incremental estimator)."""
    view = recon.views[view_id]
    w = view.camera.image_width or int(2 * view.camera.intrinsics[3]) \
        or 1024
    h = view.camera.image_height or int(2 * view.camera.intrinsics[4]) \
        or 768
    pyr = VisibilityPyramid(w, h)
    n = 0
    for t, feat in view.features.items():
        tr = recon.tracks.get(t)
        if tr is not None and tr.is_estimated:
            pyr.add_point(feat[0], feat[1])
            n += 1
    if n == 0:
        return 0
    return pyr.compute_score()
